"""Stage-by-stage device-time profile of the megapass frame.

Builds a ladder of jit programs, each one stage deeper into
trace_image_fast, all returning one scalar; successive differences give
per-stage device cost (each program pays the same ~25 ms tunnel floor).

  python scripts/micro_stages.py
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.ops.pallas_bvh import PACKET, bvh_intersect
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.render import tracer
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.scene.readers.obj import read_obj


def timed(fn, *args, reps=9):
    float(np.asarray(fn(*args)))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(fn(*args)))
        ts.append(time.time() - t0)
        args = tuple(a + 1e-7 if hasattr(a, "dtype") else a for a in args)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # median defeats tunnel jitter


def main():
    W = 512
    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = build_scene_bvh([cm])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=W, film_height=W,
        samples=1, max_depth=1, jitter_window=0.0)
    rays0 = cam.generate_rays()
    n = rays0.capacity
    out = {}

    # floor: trivial program
    out["floor_ms"] = round(timed(jax.jit(
        lambda s: (rays0.origin + s).sum()), jnp.float32(1e-6)), 1)

    # kernel only: closest-hit over the camera wavefront (object space =
    # world space here, single identity instance)
    valid = jnp.ones((n,), jnp.int32)
    root = jnp.full((n // PACKET,), int(accel.mesh_root[0]), jnp.int32)

    @jax.jit
    def k1(s):
        t, p, u, v = bvh_intersect(rays0.origin + s, rays0.direction, valid,
                                   root, accel.bounds, accel.meta, accel.tri)
        return t.sum()
    out["kernel_closest_ms"] = round(timed(k1, jnp.float32(1e-6)), 1)

    # kernel at 64K rays (size scaling: fixed overhead vs per-ray cost)
    n4 = n // 4
    valid4 = jnp.ones((n4,), jnp.int32)
    root4 = jnp.full((n4 // PACKET,), int(accel.mesh_root[0]), jnp.int32)

    @jax.jit
    def k1s(s):
        t, p, u, v = bvh_intersect(
            rays0.origin[:n4] + s, rays0.direction[:n4], valid4, root4,
            accel.bounds, accel.meta, accel.tri)
        return t.sum()
    out["kernel_closest_64k_ms"] = round(timed(k1s, jnp.float32(1e-6)), 1)

    @jax.jit
    def k2(s):
        t, p, u, v = bvh_intersect(rays0.origin + s, rays0.direction, valid,
                                   root, accel.bounds, accel.meta, accel.tri)
        t2, p2, _, _ = bvh_intersect(
            rays0.origin + s + 1e-5, rays0.direction, valid, root,
            accel.bounds, accel.meta, accel.tri, any_hit=True)
        return t.sum() + t2.sum()
    out["kernel_both_ms"] = round(timed(k2, jnp.float32(1e-6)), 1)

    # shuffle only
    fb0 = jnp.zeros((W * W, 4), jnp.float32)

    @jax.jit
    def sh(s):
        arena, fb = tracer.shuffle(scene, rays0.replace(
            origin=rays0.origin + s), fb0)
        return arena.t_max.sum() + fb.sum()
    out["shuffle_ms"] = round(timed(sh, jnp.float32(1e-6)), 1)

    # ladder into the megapass: phase 1 only (shuffle + closest + shade +
    # spawn build), then everything except the final any-hit, then full
    @jax.jit
    def phase1(s):
        rays = rays0.replace(origin=rays0.origin + s)
        arena, fb = tracer.shuffle(scene, rays, fb0)
        o_obj, d_obj, ray_mesh = tracer.to_object_space(scene, arena)
        queued = arena.active & (arena.inst >= 0) & (ray_mesh >= 0)
        hit = tracer._intersect_bvh(scene, accel, o_obj, d_obj, ray_mesh,
                                    queued)
        return hit.t.sum() + hit.prim.sum()
    out["p1_shuffle_closest_ms"] = round(timed(phase1, jnp.float32(1e-6)), 1)

    @jax.jit
    def phase2(s):
        rays = rays0.replace(origin=rays0.origin + s)
        arena, fb = tracer.shuffle(scene, rays, fb0)
        o_obj, d_obj, ray_mesh = tracer.to_object_space(scene, arena)
        queued = arena.active & (arena.inst >= 0) & (ray_mesh >= 0)
        hit = tracer._intersect_bvh(scene, accel, o_obj, d_obj, ray_mesh,
                                    queued)
        surf = queued & (hit.prim >= 0)
        arena, fb, spawn = tracer._process_surface_hits(
            scene, arena, fb, hit, surf, jnp.int32(0))
        return spawn.sum() + fb.sum()
    out["p2_plus_shade_spawn_ms"] = round(timed(phase2, jnp.float32(1e-6)), 1)

    @jax.jit
    def full(s):
        fb = tracer.trace_image_fast(
            scene, rays0.replace(origin=rays0.origin + s), W, W, accel=accel)
        return fb[:8, :].sum()
    out["full_ms"] = round(timed(full, jnp.float32(1e-6)), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
