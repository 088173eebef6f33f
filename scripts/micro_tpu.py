"""Microbenchmarks on the live TPU: attribute per-round cost."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = 655360


def bench(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.tree.map(lambda x: np.asarray(x if x.ndim == 0 else x.ravel()[:1]),
                 out)
    ts = []
    for i in range(reps):
        t0 = time.time()
        out = fn_j(*args)
        jax.tree.map(
            lambda x: np.asarray(x if x.ndim == 0 else x.ravel()[:1]), out)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: {ts[len(ts)//2]*1e3:.1f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (N,), 0, 4).astype(jnp.int32)
    vals3 = jax.random.normal(key, (N, 3), jnp.float32)
    vals = jax.random.normal(key, (N,), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, N).astype(jnp.int32)

    bench("noop scalar", lambda k: jnp.sum(k[:128]), keys)
    bench("argsort stable N", lambda k: jnp.argsort(k, stable=True), keys)
    bench("sort N", lambda v: jnp.sort(v), vals)
    bench("cumsum N", lambda k: jnp.cumsum(k), keys)
    bench("gather 13xN (perm)", lambda v, i: tuple(v[:, j % 3][i]
          for j in range(13)), vals3, idx)
    bench("scatter 12xN", lambda v, i: tuple(
        jnp.zeros((N,), jnp.float32).at[i].set(v[:, j % 3], mode="drop")
        for j in range(12)), vals3, idx)
    bench("eltwise 30 passes", lambda v: sum(
        jnp.sin(v * (1 + 0.01 * j)).sum() for j in range(30)), vals3)

    # full _round_step vs its parts on the real scene
    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import (_initial_shuffle, _round_step,
                                          make_arena, to_object_space,
                                          _intersect_bvh)
    from gravit_tpu.core.rays import RayType
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
    print(f"arena capacity: {arena.capacity}", flush=True)

    def kernel_only(arena):
        o_obj, d_obj, ray_mesh = to_object_space(scene, arena)
        queued = arena.active & (arena.inst >= 0) & (ray_mesh >= 0)
        hit = _intersect_bvh(scene, accel, o_obj, d_obj, ray_mesh, queued,
                             is_shadow=(arena.type == int(RayType.SHADOW)))
        return hit.t.sum()

    bench("intersect_bvh (sort+kernel)", kernel_only, arena)
    bench("round_step full",
          lambda a, f: _round_step(scene, a, f, jnp.int32(0), W, W,
                                   accel=accel), arena, fb)


if __name__ == "__main__":
    main()
