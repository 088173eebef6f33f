"""Per-round timing of the stepped accel path on the bunny frame."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def main():
    import jax.numpy as jnp
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import (_initial_shuffle, _round_step,
                                          make_arena)
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

    def run_frame(i, verbose=False):
        arena = arena0.replace(origin=arena0.origin + 1.7e-6 * (i + 1))
        t0 = time.time()
        arena, fb = _initial_shuffle(scene, arena, W, W)
        if verbose:
            np.asarray(fb[:1, :1])
            print(f"  shuffle: {time.time()-t0:.3f}s", flush=True)
        for r in range(16):
            t0 = time.time()
            arena, fb, live = _round_step(
                scene, arena, fb, jnp.int32(r), W, W, accel=accel)
            n_live = int(live)
            if verbose:
                print(f"  round {r}: {time.time()-t0:.3f}s live={n_live}",
                      flush=True)
            if n_live == 0:
                break
        return fb

    # warmup/compile
    t0 = time.time()
    fb = run_frame(100)
    np.asarray(fb[:1, :1])
    print(f"compile+first frame: {time.time()-t0:.1f}s", flush=True)

    for i in range(2):
        t0 = time.time()
        fb = run_frame(i, verbose=True)
        s = float(np.asarray(fb).sum())
        print(f"frame {i}: {time.time()-t0:.3f}s checksum={s:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
