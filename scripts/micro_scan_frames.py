"""Measure pure device throughput of the megapass by scanning N frames
inside ONE compiled program (single tunnel RPC), returning one scalar.

Disambiguates tunnel per-RPC overhead (~25 ms serialized, measured by
micro_pipeline.py) from actual device time per frame.

  python scripts/micro_scan_frames.py [N]
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.render.tracer import trace_image_fast
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.scene.readers.obj import read_obj


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    W = 512
    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = build_scene_bvh([cm])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=W, film_height=W,
        samples=1, max_depth=1, jitter_window=0.0)
    rays0 = cam.generate_rays()

    @jax.jit
    def one_frame(salt):
        rays = rays0.replace(origin=rays0.origin + salt)
        fb = trace_image_fast(scene, rays, W, W, accel=accel)
        return fb[:8, :].sum()

    @jax.jit
    def frames(salts):
        def body(acc, salt):
            rays = rays0.replace(origin=rays0.origin + salt)
            fb = trace_image_fast(scene, rays, W, W, accel=accel)
            return acc + fb[:8, :].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), salts)
        return acc

    # single-frame program, scalar return (1 RPC + fetch)
    float(np.asarray(one_frame(jnp.float32(1e-6))))  # warm
    t0 = time.time()
    for i in range(5):
        float(np.asarray(one_frame(jnp.float32(1.3e-6 * (i + 1)))))
    one_ms = (time.time() - t0) / 5 * 1e3

    # N frames in one program
    salts = jnp.arange(1, n_frames + 1, dtype=jnp.float32) * 1.7e-6
    float(np.asarray(frames(salts)))  # warm (compile)
    t0 = time.time()
    float(np.asarray(frames(salts + 3.1e-6)))
    scan_s = time.time() - t0
    per_frame_ms = scan_s / n_frames * 1e3

    print(json.dumps({
        "one_frame_scalar_ms": round(one_ms, 1),
        "scan_frames": n_frames,
        "scan_total_ms": round(scan_s * 1e3, 1),
        "scan_ms_per_frame": round(per_frame_ms, 2),
        "scan_rays_per_s": round(W * W / (per_frame_ms / 1e3)),
    }))


if __name__ == "__main__":
    main()
