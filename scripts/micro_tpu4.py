"""Differential per-round attribution ON HARDWARE, memoization-proofed:
every rep perturbs the arena origin so the axon tunnel cannot replay a
cached execution, and the result is fetched (only a host fetch forces
execution here)."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench(name, fn, arena, fb, reps=4):
    def wrapped(a, f, eps):
        a = a.replace(origin=a.origin + eps)
        out = fn(a, f)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    fn_j = jax.jit(wrapped)
    float(np.asarray(fn_j(arena, fb, 1e-7)))  # compile
    ts = []
    for i in range(reps):
        eps = 1e-6 * (i + 1)
        t0 = time.time()
        float(np.asarray(fn_j(arena, fb, eps)))
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: median {ts[len(ts)//2]*1e3:.1f} ms  all="
          f"{[round(t*1e3,1) for t in ts]}", flush=True)


def main():
    import gravit_tpu.render.tracer as TR
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj
    from gravit_tpu.ops.intersect import Hit

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
    arena0 = TR.make_arena(cam.generate_rays(), scene.num_lights)
    arena, fb = TR._initial_shuffle(scene, arena0, W, W)
    N = arena.capacity
    print(f"arena capacity {N}", flush=True)

    bench("noop (tunnel floor)", lambda a, f: (a.t.sum(),), arena, fb)

    def run(a, f):
        a2, f2 = TR.trace_round(scene, a, f, jnp.int32(0), 256, accel=accel)
        return a2.t, a2.origin, f2

    bench("FULL round", run, arena, fb)

    orig_isect = TR._intersect_bvh
    TR._intersect_bvh = lambda s, ac, o, d, rm, q, is_shadow=None: Hit(
        t=jnp.full((N,), 0.1) + o[:, 0] * 1e-12,
        prim=jnp.zeros((N,), jnp.int32),
        u=jnp.full((N,), 0.3), v=jnp.full((N,), 0.3))
    bench("no-intersect", run, arena, fb)
    TR._intersect_bvh = orig_isect

    orig_proc = TR._process_surface_hits
    def fake_proc(scene, a, f, hit, mask, r):
        n = a.capacity
        L = scene.num_lights
        spawn = jnp.zeros((n * L, 16), jnp.float32) + hit.t[0] * 1e-12
        a = a.replace(active=a.active & ~mask)
        return a, f, spawn
    TR._process_surface_hits = fake_proc
    bench("no-process", run, arena, fb)
    TR._process_surface_hits = orig_proc

    orig_append = TR._append_rays
    TR._append_rays = lambda a, s: a
    bench("no-append", run, arena, fb)
    TR._append_rays = orig_append

    orig_shuffle = TR.shuffle
    TR.shuffle = lambda s, a, f, initial=True: (a, f)
    bench("no-shuffle", run, arena, fb)
    TR.shuffle = orig_shuffle

    # kernel alone, full-arena dispatch (what a round actually pays)
    def kern_only(a, f):
        o, d, rm = TR.to_object_space(scene, a)
        q = a.active & (a.inst >= 0) & (rm >= 0)
        h = TR._intersect_bvh(scene, accel, o, d, rm, q,
                              is_shadow=(a.type == 3))
        return (h.t,)
    bench("kernel only (2 passes)", kern_only, arena, fb)


if __name__ == "__main__":
    main()
