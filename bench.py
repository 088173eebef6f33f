"""Benchmark harness: bunny.obj surface render, 512x512, on real hardware.

Mirrors the reference bench shape (Test/GVTTest/GVTTest.cpp:493-530 /
BenchOspray.cpp:322-339): warm-up frames then timed frames, reporting
rays/s. Prints ONE JSON line.

The reference publishes no absolute numbers (BASELINE.md), so the baseline
is self-measured: 8.0e4 primary rays/s — this framework's round-1 pure-jnp
brute-force tracer on one TPU v5e chip (the starting point every later
kernel is measured against).

Note: inputs are perturbed per frame — the axon remote-execution path
memoizes identical dispatches, which would fake sub-ms frames.
"""

import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

BASELINE_RAYS_PER_S = 8.0e4

WIDTH = HEIGHT = 512
WARMUP = 2
FRAMES = 5


def main():
    import numpy as np

    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import make_arena, trace_image
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj

    mesh = read_obj("/root/reference/data/geom/bunny.obj")
    cm = mesh.compile()
    scene = build_scene(
        [cm],
        [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = build_scene_bvh([cm])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0),
        film_width=WIDTH, film_height=HEIGHT,
        samples=1, max_depth=1, jitter_window=0.0)
    arena0 = make_arena(cam.generate_rays(), scene.num_lights)

    def frame(i):
        # per-frame origin jitter (sub-pixel) gives every frame distinct
        # inputs AND outputs, defeating remote dispatch memoization
        arena = arena0.replace(origin=arena0.origin + 1.7e-6 * (i + 1))
        return trace_image(scene, arena, WIDTH, HEIGHT, max_rounds=32,
                           accel=accel)

    for i in range(WARMUP):
        fb = frame(1000 + i)
        float(np.asarray(fb[:8, :]).sum())

    times = []
    for i in range(FRAMES):
        t0 = time.time()
        fb = frame(i)
        # force a real device->host materialization; block_until_ready is
        # not sufficient under the axon remote-execution tunnel
        float(np.asarray(fb[:8, :]).sum())
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]  # median

    primary = WIDTH * HEIGHT
    rays_per_s = primary / dt
    print(json.dumps({
        "metric": "bunny_primary_rays_per_s",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
