"""Inner benchmark worker (invoked by bench.py in a subprocess so a wedged
remote TPU terminal can be timed out and fallen back from).

Modes (first matching flag wins):
  --fast     single-instance megapass tracer (2 kernel dispatches/frame)
  --accel    looped tracer + Pallas BVH, whole frame fused in one program
  --accel --stepped   one bounded program per round
  --brute    jnp brute-force intersector
  --volume   wavelet-volume ray march (the BenchOspray analog)
"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

WIDTH = HEIGHT = 512
WARMUP = 1
FRAMES = 3


def _bunny():
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj

    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0),
        film_width=WIDTH, film_height=HEIGHT,
        samples=1, max_depth=1, jitter_window=0.0)
    return cm, scene, cam


def _timed(frame, n_rays, mode):
    # inputs are perturbed per frame (the axon dispatch layer memoizes
    # identical executions) and fetched to force materialization
    for i in range(WARMUP):
        fb = frame(1000 + i)
        float(np.asarray(fb[:8, :]).sum())
    times = []
    for i in range(FRAMES):
        t0 = time.time()
        fb = frame(i)
        float(np.asarray(fb[:8, :]).sum())
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(json.dumps({"ms_per_frame": dt * 1000,
                      "rays_per_s": n_rays / dt,
                      "mode": mode}))


def main_surface():
    use_accel = "--accel" in sys.argv or "--fast" in sys.argv
    fast = "--fast" in sys.argv
    fused = "--stepped" not in sys.argv

    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.tracer import (make_arena, trace_image,
                                          trace_image_fast,
                                          trace_image_stepped)

    cm, scene, cam = _bunny()
    accel = build_scene_bvh([cm]) if use_accel else None
    rays0 = cam.generate_rays()
    arena0 = None if fast else make_arena(rays0, scene.num_lights)

    # GRAVIT_BENCH_SCATTER=1 falls back to the pixel-id scatter deposit
    # (the round-start megapass config) if dense-deposit golden validation
    # is ever in question on the live device
    import os
    dense = os.environ.get("GRAVIT_BENCH_SCATTER", "0") != "1"

    def frame(i):
        if fast:
            rays = rays0.replace(origin=rays0.origin + 1.7e-6 * (i + 1))
            return trace_image_fast(scene, rays, WIDTH, HEIGHT, accel=accel,
                                    dense_deposit=dense)
        arena = arena0.replace(origin=arena0.origin + 1.7e-6 * (i + 1))
        if fused:
            return trace_image(scene, arena, WIDTH, HEIGHT,
                               max_rounds=8, accel=accel)
        return trace_image_stepped(scene, arena, WIDTH, HEIGHT,
                                   max_rounds=16, accel=accel)

    mode = ("fast" if fast
            else "accel-fused" if (use_accel and fused)
            else "accel" if use_accel else "brute")
    _timed(frame, WIDTH * HEIGHT, mode)


def main_volume():
    """Wavelet 64^3 structured volume at 512^2 — the BenchOspray analog
    (Test/OSPRayTest/BenchOspray.cpp:322-339)."""
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import trace_volume
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.volume import wavelet_volume

    n = 64
    vol = wavelet_volume(n)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    c = (n - 1) / 2.0
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=(c, c, c), up=(0.0, 0.0, 1.0),
        fov=float(30 * np.pi / 180), film_width=WIDTH, film_height=HEIGHT,
        samples=1, max_depth=1, jitter_window=0.0)
    rays0 = cam.generate_rays(volume=True)
    arena0 = make_arena(rays0, 0)

    def frame(i):
        arena = arena0.replace(origin=arena0.origin + 1.7e-4 * (i + 1))
        return trace_volume(scene, arena, WIDTH, HEIGHT, max_rounds=16)

    _timed(frame, WIDTH * HEIGHT, "volume")


if __name__ == "__main__":
    if "--volume" in sys.argv:
        main_volume()
    else:
        main_surface()
