"""Sub-split of _process_surface_hits (phase B) on hardware: cumulative
stages scanned in-program; float-sum sinks (never int: int*0 is DCE'd)."""

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
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.ops.intersect import Hit
from gravit_tpu.ops.pallas_bvh import PACKET
from gravit_tpu.render import tracer as T
from gravit_tpu.render.tracer import (RAY_EPSILON, RayType, _gather_inst,
                                      _pack_shade_table, _safe_norm,
                                      _unpack_shade_row, hash_uniform2)
from gravit_tpu.scene import image as image_lib
from gravit_tpu.scene.light import LightKind
from gravit_tpu.scene.material import shade_full

WIDTH = HEIGHT = 512
REPS = 10


def main():
    scene, cam = scenes.simple_scene(WIDTH, HEIGHT)
    rays0 = cam.generate_rays()
    Tt = int(PACKET ** 0.5)
    rays_t = T._tile_remap(rays0, WIDTH, HEIGHT, Tt)
    n = rays_t.capacity
    fb0 = image_lib.new_framebuffer(WIDTH, HEIGHT)

    @jax.jit
    def setup(rays):
        arena, fb = T.shuffle(scene, rays, fb0)
        return arena

    arena0 = setup(rays_t)
    prim0 = jnp.arange(n, dtype=jnp.int32) % scene.num_triangles
    t0_ = jnp.full((n,), 1.0, jnp.float32)
    u0 = jnp.full((n,), 0.3, jnp.float32)

    def stageval(arena, hit_t, prim, u, stage):
        mask = arena.active
        prim = jnp.clip(prim, 0, scene.num_triangles - 1)
        t_hit = jnp.where(mask, hit_t, 1.0)
        _, _, normi = _gather_inst(scene, arena.inst)
        row = _pack_shade_table(scene)[prim]
        (ns, vcol, kd_face, ks, tri_e1, tri_e2, alpha, mat_type_face,
         has_vc1, embree_rows) = _unpack_shade_row(scene, row)
        if stage == 0:
            return row.sum() + normi.sum()
        u_, v_ = u[:, None], u[:, None] * 0.5
        n_interp = ns[:, 1] * u_ + ns[:, 2] * v_ + ns[:, 0] * (1 - u_ - v_)
        n_shade = jnp.einsum("nij,nj->ni", normi, n_interp)
        n_shade = n_shade / _safe_norm(n_shade, keepdims=True)
        ng = jnp.cross(tri_e1, tri_e2)
        n_flat = jnp.einsum("nij,nj->ni", normi, ng)
        n_flat = n_flat / _safe_norm(n_flat, keepdims=True)
        flip = jnp.sum(-arena.direction * n_flat, axis=-1) <= 0.0
        normal = jnp.where(flip[:, None], -n_shade, n_shade)
        if stage == 1:
            return normal.sum()
        ci = (vcol[:, 0] * (1 - u_ - v_) + vcol[:, 1] * u_ + vcol[:, 2] * v_)
        kd = jnp.where(has_vc1[:, None], ci, kd_face)
        mat_type = jnp.where(has_vc1, 0, mat_type_face)
        w_now = arena.w
        t_shadow = (1.0 - 16.0 * RAY_EPSILON) * t_hit
        s_origin = arena.origin + arena.direction * t_shadow[:, None]
        hit_point = arena.origin + arena.direction * t_hit[:, None]
        acc = jnp.float32(0.0)
        rng_extra = jnp.uint32(0)
        for li in range(scene.num_lights):
            xi = hash_uniform2(arena.id, 11 + li, rng_extra)
            lpos = jnp.broadcast_to(scene.lights_pos[li], (n, 3)) \
                + xi[:, 0:1] * 0.0
            dist = _safe_norm(lpos - hit_point)
            fall = jnp.minimum(1.0, 1.0 / jnp.maximum(dist, 1e-30))
            li_contrib = scene.lights_color[li] * fall[:, None]
            wi = lpos - hit_point
            wi = wi / _safe_norm(wi, keepdims=True)
            ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
            if stage == 2:
                acc += ndotl.sum() + li_contrib.sum()
                continue
            c = shade_full(mat_type, kd, ks, alpha, embree_rows,
                           arena.direction, w_now, normal, wi)
            c = jnp.clip(c * li_contrib, 0.0, 1.0)
            if stage == 3:
                acc += c.sum()
                continue
            sdir = lpos - s_origin
            rowv = jnp.concatenate([
                s_origin, sdir, c, t_hit[:, None],
                jnp.full((n, 1), 3.0, jnp.float32), w_now[:, None],
                arena.id.astype(jnp.float32)[:, None],
                arena.depth.astype(jnp.float32)[:, None],
                arena.inst.astype(jnp.float32)[:, None],
                ndotl[:, None]], axis=1)
            acc += rowv.sum()
        return acc

    for stage, name in [(0, "gather+inst"), (1, "normals"),
                        (2, "light_geo"), (3, "shade_full"),
                        (4, "spawn_rows")]:
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(k, stage=stage):
            def body(acc, i):
                a2 = arena0.replace(
                    origin=arena0.origin + jnp.float32(1.7e-6) * (i + 1))
                return acc + stageval(a2, t0_ + 1e-6 * i, prim0 + i, u0,
                                      stage), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return acc
        np.asarray(run(1))
        t0 = time.time()
        np.asarray(run(1))
        floor = time.time() - t0
        np.asarray(run(REPS))
        t0 = time.time()
        np.asarray(run(REPS))
        dev = ((time.time() - t0) - floor) / (REPS - 1) * 1000
        print(f"{name},{dev:.2f}")


if __name__ == "__main__":
    main()
