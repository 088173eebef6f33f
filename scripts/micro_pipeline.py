"""Separate tunnel round-trip latency from device throughput.

Dispatches N megapass frames back-to-back WITHOUT fetching (async), then
fetches all at the end. If per-frame time collapses vs the fetch-per-frame
number, the sequential bench is latency-bound on the tunnel RPC, and the
production-serving throughput is the pipelined number.

  python scripts/micro_pipeline.py [N]
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.render.tracer import trace_image_fast
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.scene.readers.obj import read_obj


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
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

    def frame(i):
        rays = rays0.replace(origin=rays0.origin + 1.7e-6 * (i + 1))
        return trace_image_fast(scene, rays, W, W, accel=accel)

    # warm
    float(np.asarray(frame(1000)[:8, :]).sum())

    # sequential (fetch per frame)
    t0 = time.time()
    for i in range(3):
        float(np.asarray(frame(i)[:8, :]).sum())
    seq_ms = (time.time() - t0) / 3 * 1e3

    # pipelined (dispatch all, fetch all at end) — inputs perturbed per
    # frame so the axon memoization layer cannot alias executions
    t0 = time.time()
    fbs = [frame(100 + i) for i in range(n_frames)]
    s = 0.0
    for fb in fbs:
        s += float(np.asarray(fb[:8, :]).sum())
    pipe_ms = (time.time() - t0) / n_frames * 1e3

    print(json.dumps({
        "seq_ms_per_frame": round(seq_ms, 1),
        "pipelined_ms_per_frame": round(pipe_ms, 1),
        "pipelined_rays_per_s": round(W * W / (pipe_ms / 1e3)),
        "n_frames": n_frames,
        "checksum": round(s, 2),
    }))


if __name__ == "__main__":
    main()
