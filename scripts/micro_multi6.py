"""Frame-level ablations of fast-multi via module monkeypatches: each
variant deletes one phase from the REAL frame; deltas attribute device
time without section artifacts (the cumulative-section method let XLA
DCE different amounts per stage and over-attributed B)."""

import functools
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path[:0] = [str(ROOT), str(ROOT / "tests")]

import jax
jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
import jax.numpy as jnp

import scenes
import gravit_tpu.render.tracer as T
from gravit_tpu.accel.scene_accel import build_scene_bvh

WIDTH = HEIGHT = 512
REPS = 8


def main():
    scene, cam = scenes.simple_scene(WIDTH, HEIGHT)
    accel = build_scene_bvh([scenes.cone_mesh(), scenes.cube_mesh()])
    rays0 = cam.generate_rays()
    orig_resolve = T._multi_resolve
    orig_next = T._next_instance
    orig_ibvh = T._intersect_bvh

    def resolve_noc(scene_, fb, arena, hit, hitr, closest, max_rounds):
        # phase B real, phase C deleted: every valid spawn deposits
        arena, fb, spawn = T._process_surface_hits(
            scene_, arena, fb, hit, arena.active, hitr, no_bounce=True)
        dep = (spawn[:, 15] > 0.5) \
            & (jnp.sum(spawn[:, 6:9] ** 2, axis=-1) > 0.0)
        return spawn, dep

    def next_cheap(scene_, origin, direction, t_max, prev, pending):
        n = origin.shape[0]
        return (jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
                jnp.full((n,), T.FLT_MAX, jnp.float32))

    def ibvh_cheap(scene_, accel_, o_obj, d_obj, ray_mesh, queued,
                   is_shadow=None):
        n = o_obj.shape[0]
        from gravit_tpu.ops.intersect import Hit
        # every queued ray "hits" prim 0 at t=1: phases collapse
        return Hit(t=jnp.where(queued, 1.0, T.FLT_MAX),
                   prim=jnp.where(queued, 0, -1),
                   u=jnp.zeros((n,)), v=jnp.zeros((n,)))

    MODES = [
        ("full", {}),
        ("no_C", {"_multi_resolve": resolve_noc}),
        ("no_hop", {"_next_instance": next_cheap}),
        ("no_kernel", {"_intersect_bvh": ibvh_cheap}),
        ("no_hop_no_kernel", {"_next_instance": next_cheap,
                              "_intersect_bvh": ibvh_cheap}),
    ]
    for name, patches in MODES:
        for k, v in patches.items():
            setattr(T, k, v)

        @functools.partial(jax.jit, static_argnames=("k",))
        def scan_frames(k, name=name):
            def body(_, i):
                rays = rays0.replace(
                    origin=rays0.origin + 1.7e-6 * (i + 1))
                fb = T.trace_image_fast_multi.__wrapped__(
                    scene, rays, WIDTH, HEIGHT, accel=accel,
                    max_rounds=64, samples=1, tile_order=True,
                    dense_deposit=True)
                return 0, fb[:64]
            _, fbs = jax.lax.scan(body, 0, jnp.arange(k))
            return jnp.sum(fbs, axis=0)

        np.asarray(scan_frames(1))
        t0 = time.time()
        np.asarray(scan_frames(1))
        floor = time.time() - t0
        np.asarray(scan_frames(REPS))
        t0 = time.time()
        np.asarray(scan_frames(REPS))
        dev = ((time.time() - t0) - floor) / (REPS - 1) * 1000
        print(f"{name},{dev:.1f}")
        T._multi_resolve = orig_resolve
        T._next_instance = orig_next
        T._intersect_bvh = orig_ibvh


if __name__ == "__main__":
    main()
