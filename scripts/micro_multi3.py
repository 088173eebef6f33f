"""Cumulative-section device timing of the fast-multi frame: each row is
a jitted program running sections [0..k] of the frame, scanned REPS
times with per-rep perturbation; differences between rows give each
section's device cost."""

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
from gravit_tpu.scene import image as image_lib

WIDTH = HEIGHT = 512
REPS = 10
FLT_MAX = T.FLT_MAX


def main():
    scene, cam = scenes.simple_scene(WIDTH, HEIGHT)
    accel = build_scene_bvh([scenes.cone_mesh(), scenes.cube_mesh()])
    rays0 = cam.generate_rays()
    Tt = int(PACKET ** 0.5)
    rays_t = T._tile_remap(rays0, WIDTH, HEIGHT, Tt)
    n = rays_t.capacity
    fb0 = image_lib.new_framebuffer(WIDTH, HEIGHT)
    thresh = -(-max(PACKET, n // 8) // PACKET) * PACKET

    def closest(o_obj, d_obj, mesh, queued, is_shadow=None):
        return T._intersect_bvh(scene, accel, o_obj, d_obj, mesh, queued,
                                is_shadow=is_shadow)

    def upto(stage):
        def frame(i):
            rays = rays_t.replace(origin=rays_t.origin + 1.7e-6 * (i + 1))
            arena, fb = T.shuffle(scene, rays, fb0)
            if stage == 0:
                return fb + arena.origin.sum()
            hit = Hit(t=jnp.full((n,), FLT_MAX, jnp.float32),
                      prim=jnp.full((n,), -1, jnp.int32),
                      u=jnp.zeros((n,), jnp.float32),
                      v=jnp.zeros((n,), jnp.float32))
            hitr = jnp.zeros((n,), jnp.int32)

            def a_body(state):
                r, arena, hit, hitr = state
                o_obj, d_obj, mesh = T.to_object_space(scene, arena)
                queued = arena.active & (arena.inst >= 0) & (mesh >= 0)
                h = closest(o_obj, d_obj, mesh, queued)
                got = queued & (h.prim >= 0)
                hit = Hit(t=jnp.where(got, h.t, hit.t),
                          prim=jnp.where(got, h.prim, hit.prim),
                          u=jnp.where(got, h.u, hit.u),
                          v=jnp.where(got, h.v, hit.v))
                hitr = jnp.where(got, r, hitr)
                escapes = queued & (h.prim < 0)
                arena = arena.replace(
                    prev=jnp.where(escapes, arena.inst, arena.prev),
                    inst=jnp.where(escapes, -1, arena.inst),
                    active=arena.active & ~got)
                pending = arena.active & (arena.inst < 0)
                found, nxt, t_entry = T._next_instance(
                    scene, arena.origin, arena.direction, arena.t_max,
                    arena.prev, pending)
                requeue = pending & found
                arena = arena.replace(
                    origin=jnp.where(
                        requeue[:, None],
                        arena.origin + arena.direction
                        * (t_entry * 0.95)[:, None], arena.origin),
                    inst=jnp.where(requeue, nxt, arena.inst),
                    active=arena.active & ~(pending & ~found))
                return r + 1, arena, hit, hitr

            r, arena, hit, hitr = jax.lax.while_loop(
                lambda s: (s[0] < 64)
                & (jnp.sum(s[1].active.astype(jnp.int32)) > thresh),
                a_body, (jnp.int32(0), arena, hit, hitr))
            if stage == 1:
                return fb + hit.t.sum() * 0
            sel = T._live_first_sel(arena.active, thresh)
            arena_s = jax.tree.map(lambda a: a[sel], arena)
            hit_s = jax.tree.map(lambda a: a[sel], hit)
            r, arena_s, hit_s, hitr_s = jax.lax.while_loop(
                lambda s: (s[0] < 64) & jnp.any(s[1].active),
                a_body, (r, arena_s, hit_s, hitr[sel]))
            arena = jax.tree.map(lambda b, sm: b.at[sel].set(sm),
                                 arena, arena_s)
            hit = jax.tree.map(lambda b, sm: b.at[sel].set(sm),
                               hit, hit_s)
            hitr = hitr.at[sel].set(hitr_s)
            if stage == 2:
                return fb + hit.t.sum() * 0
            resolved = hit.prim >= 0
            arena = arena.replace(active=resolved)
            arena2, fb2, spawn = T._process_surface_hits(
                scene, arena, fb, hit, resolved, hitr, no_bounce=True)
            if stage == 3:
                return fb + spawn.sum() * 0
            spawn2, dep = T._multi_resolve(scene, fb, arena, hit, hitr,
                                           closest, 64)
            if stage == 4:
                return fb + dep.sum() * 0
            per_lane = T._spawn_rgba(spawn2, dep).reshape(
                1, n, 4).sum(axis=0)
            fb = T._per_lane_to_fb(fb, per_lane, n, 1, True,
                                   WIDTH, HEIGHT, Tt)
            return image_lib.clamp_rgb(fb)

        @functools.partial(jax.jit, static_argnames=("k",))
        def scan_frames(k):
            def body(_, i):
                return 0, frame(i)[:64]
            _, fbs = jax.lax.scan(body, 0, jnp.arange(k))
            return jnp.sum(fbs, axis=0)
        return scan_frames

    prev = 0.0
    for stage, name in [(0, "shuffle"), (1, "A_stage1"), (2, "A_stage2"),
                        (3, "B_shade"), (4, "B+C"), (5, "full")]:
        run = upto(stage)
        np.asarray(run(1))
        t0 = time.time()
        np.asarray(run(1))
        floor = time.time() - t0
        np.asarray(run(REPS))
        t0 = time.time()
        np.asarray(run(REPS))
        dev = ((time.time() - t0) - floor) / (REPS - 1) * 1000
        print(f"{name},{dev:.1f},delta={dev - prev:.1f}")
        prev = dev


if __name__ == "__main__":
    main()
