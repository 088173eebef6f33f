"""In-frame ablation of _process_surface_hits inside the REAL fast-multi
frame: monkeypatch the module global with variants that skip pieces of
the shade; the full-frame device-time deltas attribute the ~18 ms the
standalone sub-splits could not (fusion-context cost)."""

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
    orig = T._process_surface_hits

    def variant(mode):
        def psh(scene_, arena, fb, hit, mask, round_idx, no_bounce=False):
            if mode == "full":
                return orig(scene_, arena, fb, hit, mask, round_idx,
                            no_bounce=no_bounce)
            n = arena.capacity
            t_hit = jnp.where(mask, hit.t, 1.0)
            if mode == "const":
                # same spawn SHAPE/validity, near-zero shade content
                s_origin = arena.origin
                c = jnp.broadcast_to(jnp.float32(0.25), (n, 3))
                sdir = -arena.direction
                valid = mask
            elif mode == "nonormals":
                # real light math on the FLAT direction (skip table
                # gather + interp normals + einsums)
                normal = -arena.direction
                lpos = jnp.broadcast_to(scene_.lights_pos[0], (n, 3))
                hit_point = arena.origin + arena.direction * t_hit[:, None]
                wi = lpos - hit_point
                wi = wi / T._safe_norm(wi, keepdims=True)
                ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
                dist = T._safe_norm(lpos - hit_point)
                fall = jnp.minimum(1.0, 1.0 / jnp.maximum(dist, 1e-30))
                c = jnp.clip((ndotl * fall)[:, None]
                             * scene_.lights_color[0], 0.0, 1.0)
                s_origin = arena.origin + arena.direction \
                    * ((1.0 - 16.0 * T.RAY_EPSILON) * t_hit)[:, None]
                sdir = lpos - s_origin
                valid = mask & (ndotl > 0.0)
            spawn = jnp.concatenate([
                s_origin, sdir, c, t_hit[:, None],
                jnp.full((n, 1), 3.0, jnp.float32),
                arena.w[:, None],
                arena.id.astype(jnp.float32)[:, None],
                arena.depth.astype(jnp.float32)[:, None],
                arena.inst.astype(jnp.float32)[:, None],
                valid.astype(jnp.float32)[:, None]], axis=1)
            arena = arena.replace(active=arena.active & ~mask)
            return arena, fb, spawn
        return psh

    for mode in ("full", "nonormals", "const"):
        T._process_surface_hits = variant(mode)

        @functools.partial(jax.jit, static_argnames=("k",))
        def scan_frames(k, mode=mode):
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
        print(f"{mode},{dev:.1f}")
    T._process_surface_hits = orig


if __name__ == "__main__":
    main()
