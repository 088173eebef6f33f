"""Benchmark suite: per-scheduler warm + timed frames, CSV output.

Mirrors Test/GVTTest/GVTTest.cpp:493-530 (per-scheduler frame loops) and
BenchOspray.cpp:322-339 (CSV ms/frame + fps). Run on the TPU for real
numbers; runs on CPU for smoke.

Rows: scene, scheduler, ms/frame (median), fps, Mray/s (primary).
"""

import sys
import time
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

WARM, FRAMES = 2, 5


def _time_frames(frame_fn):
    for i in range(WARM):
        fb = frame_fn(1000 + i)
        float(np.asarray(fb[:8, :]).sum())
    times = []
    for i in range(FRAMES):
        t0 = time.time()
        fb = frame_fn(i)
        float(np.asarray(fb[:8, :]).sum())
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def bench_bunny_image(size):
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import make_arena, trace_image
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj
    import jax

    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = (build_scene_bvh([cm])
             if jax.default_backend() not in ("cpu",) else None)
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45 * np.pi / 180), film_width=size, film_height=size)
    arena0 = make_arena(cam.generate_rays(), 1)

    def frame(i):
        arena = arena0.replace(origin=arena0.origin + 1.3e-6 * (i + 1))
        return trace_image(scene, arena, size, size, max_rounds=32,
                           accel=accel)

    return _time_frames(frame), size * size


def bench_simple_image(size):
    from scenes import simple_scene
    from gravit_tpu.render.tracer import make_arena, trace_image

    scene, cam = simple_scene(size, size)
    arena0 = make_arena(cam.generate_rays(), 1)

    def frame(i):
        arena = arena0.replace(origin=arena0.origin + 1.3e-6 * (i + 1))
        return trace_image(scene, arena, size, size, max_rounds=48)

    return _time_frames(frame), size * size


def bench_wavelet_volume(size, n=64):
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import trace_volume
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.volume import wavelet_volume

    vol = wavelet_volume(n)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    c = (n - 1) / 2
    cam = PerspectiveCamera(
        eye=(4.0 * n,) * 3, focus=(c, c, c), up=(0.0, 0.0, 1.0),
        fov=float(30 * np.pi / 180), film_width=size, film_height=size)
    arena0 = make_arena(cam.generate_rays(volume=True), 0)

    def frame(i):
        arena = arena0.replace(origin=arena0.origin + 1.3e-6 * (i + 1))
        return trace_volume(scene, arena, size, size, max_rounds=8)

    return _time_frames(frame), size * size


def main():
    import jax

    size = 512 if jax.default_backend() != "cpu" else 64
    print(f"# backend={jax.default_backend()} film={size}x{size}")
    print("scene,scheduler,ms_per_frame,fps,mray_s")
    for name, fn in [("bunny", bench_bunny_image),
                     ("simple", bench_simple_image),
                     ("wavelet64", bench_wavelet_volume)]:
        dt, rays = fn(size)
        print(f"{name},image,{dt*1000:.2f},{1.0/dt:.2f},{rays/dt/1e6:.2f}")


if __name__ == "__main__":
    main()
