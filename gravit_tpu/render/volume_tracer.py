"""Wavefront volume tracer: ray-march bricks + flag-protocol shuffle.

Round structure mirrors the reference's volume path (SURVEY.md §3.4):
  1. march every queued ray through its brick (ops.volume_march) — the
     ospTraceRays step; rays accumulate rgb in color, opacity in w, and get
     RAY_OPAQUE / RAY_BOUNDARY termination flags in depth
  2. volume shuffle (DomainTracer.cpp:255-305): BOUNDARY rays re-enter the
     instance BVH (excluding the brick just left), bump origin by
     (1+eps)*t into the next brick or become EXTERNAL_BOUNDARY; PRIMARY
     rays with OPAQUE|EXTERNAL deposit color*w and retire
The initial camera-ray filter is the generic 0.95-bump queueing
(DomainTracer.h:158-167) — flags are only honored after the first march.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gravit_tpu.core.rays import (FLT_MAX, RAY_BOUNDARY,
                                  RAY_EXTERNAL_BOUNDARY, RAY_OPAQUE,
                                  RayArena, VolumeRayType)
from gravit_tpu.ops.volume_march import march_brick
from gravit_tpu.render.volume_scene import VolumeSceneData
from gravit_tpu.scene import image as image_lib

RAY_EPSILON = 1e-6


def _instance_bvh_hit(scene: VolumeSceneData, arena: RayArena,
                      exclude: jax.Array):
    """Closest instance AABB (leaf `update=true` semantics), excluding
    `exclude` per ray. Returns (found, next_inst, tnear)."""
    dd = arena.direction
    small = jnp.abs(dd) < 1e-30
    d_safe = jnp.where(small, 1.0, dd)
    inv_dir = jnp.where(small, jnp.where(dd < 0, -1e30, 1e30), 1.0 / d_safe)
    l = (scene.inst_lo[None] - arena.origin[:, None]) * inv_dir[:, None]
    u = (scene.inst_hi[None] - arena.origin[:, None]) * inv_dir[:, None]
    tnear = jnp.max(jnp.minimum(l, u), axis=-1)
    tfar = jnp.min(jnp.maximum(l, u), axis=-1)
    hit = (
        (tfar > tnear)
        & (tnear > RAY_EPSILON)
        & (tnear < arena.t_max[:, None])
        & (jnp.arange(scene.num_instances)[None, :] != exclude[:, None])
    )
    tnear = jnp.where(hit, tnear, FLT_MAX)
    nxt = jnp.argmin(tnear, axis=1).astype(jnp.int32)
    t_entry = jnp.take_along_axis(tnear, nxt[:, None], axis=1)[:, 0]
    return t_entry < FLT_MAX, nxt, t_entry


def filter_initial(scene: VolumeSceneData, arena: RayArena) -> RayArena:
    """Generic first queueing with 0.95*t bump (DomainTracer.h:158-167)."""
    pending = arena.active & (arena.inst < 0)
    found, nxt, t_entry = _instance_bvh_hit(
        scene, arena, jnp.full((arena.capacity,), -1, jnp.int32))
    requeue = pending & found
    origin = jnp.where(
        requeue[:, None],
        arena.origin + arena.direction * (t_entry * 0.95)[:, None],
        arena.origin)
    return arena.replace(
        origin=origin,
        inst=jnp.where(requeue, nxt, arena.inst),
        active=arena.active & (~pending | requeue),
    )


def march_round(scene: VolumeSceneData, arena: RayArena,
                differentiable: bool = False):
    """Phase 1: march all queued rays through their bricks (per-volume
    passes, statically unrolled; rays of other volumes are masked).

    Rays whose instance has no LOCAL brick data (inst_vol == -1 under the
    domain scheduler) park untouched until the all_to_all migrates them.
    """
    safe_inst = jnp.clip(arena.inst, 0, scene.num_instances - 1)
    vol_of_ray = scene.inst_vol[safe_inst]
    queued = arena.active & (arena.inst >= 0) & (vol_of_ray >= 0)
    minv = scene.inst_minv[safe_inst]
    o_obj = jnp.einsum("nij,nj->ni", minv[:, :3, :3], arena.origin) \
        + minv[:, :3, 3]
    d_obj = jnp.einsum("nij,nj->ni", minv[:, :3, :3], arena.direction)

    color, w, depth = arena.color, arena.w, arena.depth
    for v in range(scene.num_volumes):
        mask = queued & (vol_of_ray == v)
        c2, w2, flags = march_brick(
            o_obj, d_obj, mask, color, w,
            scene.vol_samples[v], scene.vol_origin[v], scene.vol_spacing[v],
            scene.vol_lo[v], scene.vol_hi[v],
            scene.vol_color_lut[v], scene.vol_opacity_lut[v],
            scene.vol_vrange[v],
            scene.vol_step[v], scene.vol_max_steps[v],
            subgrids=(scene.vol_subgrids[v]
                      if v < len(scene.vol_subgrids) else ()),
            isovalues=(scene.vol_isovalues[v]
                       if v < len(scene.vol_isovalues) else ()),
            slices=(scene.vol_slices[v]
                    if v < len(scene.vol_slices) else ()),
            early_exit=not differentiable)
        color = jnp.where(mask[:, None], c2, color)
        w = jnp.where(mask, w2, w)
        depth = jnp.where(mask, flags, depth)

    # marched rays leave their queue; `prev` remembers the brick for the
    # shuffle's exclusion
    return arena.replace(
        color=color, w=w, depth=depth,
        prev=jnp.where(queued, arena.inst, arena.prev),
        inst=jnp.where(queued, -1, arena.inst),
    )


def shuffle_volume(scene: VolumeSceneData, arena: RayArena, fb: jax.Array):
    """Phase 2: the volume flag protocol (DomainTracer.cpp:255-305)."""
    pending = arena.active & (arena.inst < 0)
    found, nxt, t_entry = _instance_bvh_hit(scene, arena, arena.prev)

    depth = arena.depth
    boundary = pending & (depth & RAY_BOUNDARY > 0)
    # BOUNDARY + hit: clear flag, bump (1+eps)*t, queue next brick
    requeue = boundary & found
    eps1 = 1.0 + jnp.float32(jnp.finfo(jnp.float32).eps)
    origin = jnp.where(
        requeue[:, None],
        arena.origin + arena.direction * (t_entry * eps1)[:, None],
        arena.origin)
    # BOUNDARY + miss: becomes EXTERNAL_BOUNDARY
    external = boundary & ~found
    depth = jnp.where(boundary, depth & ~RAY_BOUNDARY, depth)
    depth = jnp.where(external, depth | RAY_EXTERNAL_BOUNDARY, depth)

    inst = jnp.where(requeue, nxt, arena.inst)

    # PRIMARY with OPAQUE or EXTERNAL: deposit color*w, retire
    is_primary = arena.type == int(VolumeRayType.PRIMARY)
    done = pending & is_primary & (
        (depth & (RAY_OPAQUE | RAY_EXTERNAL_BOUNDARY)) > 0)
    fb = image_lib.local_add(fb, arena.id, arena.color * arena.w[:, None],
                             jnp.ones_like(arena.w), done)
    retire = done | (pending & ~requeue & ~done)

    return arena.replace(origin=origin, inst=inst, depth=depth,
                         active=arena.active & ~retire), fb


@functools.partial(jax.jit, static_argnames=("width", "height", "max_rounds",
                                             "unroll"))
def trace_volume(scene: VolumeSceneData, arena: RayArena, width: int,
                 height: int, max_rounds: int = 64,
                 unroll: bool = False) -> jax.Array:
    fb = image_lib.new_framebuffer(width, height)
    arena = filter_initial(scene, arena)

    def round_fn(arena, fb):
        arena = march_round(scene, arena, differentiable=unroll)
        return shuffle_volume(scene, arena, fb)

    if unroll:
        def body(carry, _):
            arena, fb = carry
            return round_fn(arena, fb), None
        (arena, fb), _ = jax.lax.scan(body, (arena, fb),
                                      jnp.arange(max_rounds))
        return fb

    def cond(state):
        r, arena, fb = state
        return (r < max_rounds) & jnp.any(arena.active & (arena.inst >= 0))

    def body(state):
        r, arena, fb = state
        arena, fb = round_fn(arena, fb)
        return (r + 1, arena, fb)

    _, arena, fb = jax.lax.while_loop(cond, body, (jnp.int32(0), arena, fb))
    return fb
