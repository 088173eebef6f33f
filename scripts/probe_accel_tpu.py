"""Cautious TPU probe of the accel (Pallas BVH) path, per SESSION_NOTES
mitigations: small film first, stepped dispatch, explicit host fetches.

Usage: python scripts/probe_accel_tpu.py [WIDTH] [FRAMES]
"""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W = int(sys.argv[1]) if len(sys.argv) > 1 else 128
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import make_arena, trace_image_stepped
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj

    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = build_scene_bvh([cm])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0),
        film_width=W, film_height=W,
        samples=1, max_depth=1, jitter_window=0.0)
    arena0 = make_arena(cam.generate_rays(), scene.num_lights)

    for i in range(FRAMES):
        t0 = time.time()
        arena = arena0.replace(origin=arena0.origin + 1.7e-6 * (i + 1))
        fb = trace_image_stepped(scene, arena, W, W, max_rounds=16,
                                 accel=accel)
        s = float(np.asarray(fb).sum())
        print(f"frame {i}: {time.time()-t0:.2f}s  checksum={s:.3f}",
              flush=True)
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
