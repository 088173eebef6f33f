"""Attribute per-round cost: each candidate jitted to ONE scalar output."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=5):
    def scalarize(*a):
        leaves = jax.tree.leaves(fn(*a))
        # full-array sums so XLA cannot dead-code-eliminate the work
        return sum(x.astype(jnp.float32).sum() for x in leaves)
    fn_j = jax.jit(scalarize)
    float(np.asarray(fn_j(*args)))
    ts = []
    for i in range(reps):
        t0 = time.time()
        float(np.asarray(fn_j(*args)))
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: {ts[len(ts)//2]*1e3:.1f} ms", flush=True)


def main():
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import (_initial_shuffle, _round_step,
                                          make_arena, to_object_space,
                                          _intersect_bvh, shuffle,
                                          _process_surface_hits,
                                          _append_rays, trace_round)
    from gravit_tpu.core.rays import RayType
    from gravit_tpu.ops.intersect import Hit
    from gravit_tpu.core.rays import FLT_MAX
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj

    W = 512
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
    arena, fb = _initial_shuffle(scene, arena0, W, W)
    N = arena.capacity
    print(f"arena capacity: {N}", flush=True)

    bench("noop", lambda a: a.t[:8], arena)

    def obj_space(a):
        return to_object_space(scene, a)
    bench("to_object_space", obj_space, arena)

    def isect(a):
        o, d, rm = to_object_space(scene, a)
        q = a.active & (a.inst >= 0) & (rm >= 0)
        h = _intersect_bvh(scene, accel, o, d, rm, q,
                           is_shadow=(a.type == int(RayType.SHADOW)))
        return h.t
    bench("objspace+intersect_bvh", isect, arena)

    def shuf(a, f):
        a2, f2 = shuffle(scene, a, f)
        return a2.inst, f2[:1]
    bench("shuffle (N x I + deposit)", shuf, arena, fb)

    # fake hit for process/append attribution
    def proc(a, f):
        o, d, rm = to_object_space(scene, a)
        q = a.active & (a.inst >= 0) & (rm >= 0)
        h = Hit(t=jnp.full((N,), 0.2), prim=jnp.zeros((N,), jnp.int32),
                u=jnp.full((N,), 0.3), v=jnp.full((N,), 0.3))
        a2, f2, spawn = _process_surface_hits(scene, a, f, h, q,
                                              jnp.int32(0))
        return a2.w, f2[:1], spawn["valid"]
    bench("process_surface_hits", proc, arena, fb)

    def append(a):
        nL = N * scene.num_lights
        spawn = jnp.zeros((nL, 16), jnp.float32)
        spawn = spawn.at[:, 15].set((jnp.arange(nL) % 3 == 0)
                                    .astype(jnp.float32))
        a2 = _append_rays(a, spawn)
        return a2.t
    bench("append_rays (sort+12 scatters)", append, arena)

    def full(a, f):
        a2, f2 = trace_round(scene, a, f, jnp.int32(0), 256, accel=accel)
        return a2.t, f2[:1]
    bench("trace_round full", full, arena, fb)


if __name__ == "__main__":
    main()
