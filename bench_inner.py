"""Inner benchmark worker (invoked by bench.py in a subprocess so a wedged
remote TPU terminal can be timed out and fallen back from)."""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

WIDTH = HEIGHT = 512
WARMUP = 1
FRAMES = 3


def main():
    use_accel = "--accel" in sys.argv
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import make_arena, trace_image
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj

    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = build_scene_bvh([cm]) if use_accel else None
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0),
        film_width=WIDTH, film_height=HEIGHT,
        samples=1, max_depth=1, jitter_window=0.0)
    arena0 = make_arena(cam.generate_rays(), scene.num_lights)

    from gravit_tpu.render.tracer import trace_image, trace_image_stepped

    fused = "--stepped" not in sys.argv

    def frame(i):
        # inputs are perturbed per frame (the axon dispatch layer memoizes
        # identical executions) and fetched to force materialization
        arena = arena0.replace(origin=arena0.origin + 1.7e-6 * (i + 1))
        if fused:
            # whole frame as ONE fused while_loop program (validated stable
            # on hardware after the traversal iteration cap; 12-frame soak)
            return trace_image(scene, arena, WIDTH, HEIGHT,
                               max_rounds=8, accel=accel)
        # stepped dispatch: one bounded program per round (a hung frame
        # cannot monopolize the device queue)
        return trace_image_stepped(scene, arena, WIDTH, HEIGHT,
                                   max_rounds=16, accel=accel)

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
    mode = ("accel-fused" if (use_accel and fused)
            else "accel" if use_accel else "brute")
    print(json.dumps({"ms_per_frame": dt * 1000,
                      "rays_per_s": WIDTH * HEIGHT / dt,
                      "mode": mode}))


if __name__ == "__main__":
    main()
