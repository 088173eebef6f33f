"""SPMD wavefront surface tracer — the TPU re-design of GraviT's tracers.

GraviT's structure (algorithm/ImageTracer.h:127-269 + EmbreeMeshAdapter):
per-instance ray QUEUES, traced one instance at a time on the CPU, rays
moving between queues via the instance-BVH "shuffle". Here the queue-of-
queues collapses into a single fixed-capacity RayArena: each ROUND every
queued ray is intersected against its own instance's mesh in ONE masked pass
over the concatenated triangle buffer, then hit processing (shade, shadow
spawn, Russian-roulette bounce) and the shuffle run as vectorized lane ops.
Termination = no lane holds a queued ray (GraviT: all queues empty).

Result-equivalence map (reference -> here):
  EmbreeMeshAdapter::trace closest-hit   -> ops.intersect.intersect_closest
  traceShadowRays rtcOccluded            -> same round's any-hit on SHADOW rays
  generateShadowRays + Shade             -> _process_surface_hits
  TracerBase::shuffleRays                -> shuffle()
  image->localAdd                        -> scene.image.local_add
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gravit_tpu.core.rays import FLT_MAX, RayArena, RayType
from gravit_tpu.core.rng import hash_uniform, hash_uniform2
from gravit_tpu.ops.intersect import intersect_closest, moller_trumbore
from gravit_tpu.render.scene_build import SceneData
from gravit_tpu.scene import image as image_lib
from gravit_tpu.scene.light import LightKind

RAY_EPSILON = 1e-6


def _safe_norm(x, axis=-1, keepdims=False):
    """sqrt(max(|x|^2, tiny)): NaN-free reverse-mode at x == 0 (plain
    jnp.linalg.norm backprops 0/0 there)."""
    n2 = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(n2, 1e-30))


def _choose_tile(num_tris: int) -> int:
    # small tri tiles keep the (rays x tris) broadcast temporaries in the
    # hundreds of MB; the Pallas BVH kernel replaces this path for large meshes
    return max(128, min(256, -(-num_tris // 128) * 128))


def _gather_inst(scene: SceneData, inst: jax.Array):
    """Per-ray instance data. inst (N,) clipped to valid range for gather."""
    safe = jnp.clip(inst, 0, scene.num_instances - 1)
    return (
        scene.inst_mesh[safe],
        scene.inst_minv[safe],
        scene.inst_normi[safe],
    )


def to_object_space(scene: SceneData, arena: RayArena):
    """World->object ray transform per lane (the rtcSetTransform analog).

    Direction is NOT renormalized so `t` has the same scale in both spaces.
    """
    mesh_id, minv, _ = _gather_inst(scene, arena.inst)
    o = jnp.einsum("nij,nj->ni", minv[:, :3, :3], arena.origin) + minv[:, :3, 3]
    d = jnp.einsum("nij,nj->ni", minv[:, :3, :3], arena.direction)
    mesh_id = jnp.where(arena.inst >= 0, mesh_id, -1)
    return o, d, mesh_id


def shuffle(scene: SceneData, arena: RayArena, fb: jax.Array
            ) -> Tuple[RayArena, jax.Array]:
    """Assign each unqueued ray its next instance, or retire it.

    Replicates TracerBase::shuffleRays (TracerBase.h:325-414) non-volume path
    + BVH::intersect leaf semantics (BVH.h:61-135, `update=true` slab test):
    a candidate instance hits iff tfar > tnear AND tnear > RAY_EPSILON AND
    tnear < ray.t_max; the smallest tnear wins; the instance just exited
    (`prev`) is excluded. On a hit the origin is bumped by 0.95*tnear
    (TracerBase.h:394). Retired SHADOW rays with nonzero color deposit
    color*w into the framebuffer (TracerBase.h:396-399).
    """
    pending = arena.active & (arena.inst < 0)

    # reciprocal directions: zero components get a big finite value instead
    # of inf so reverse-mode AD stays NaN-free (double-where pattern);
    # forward behavior is unchanged for any ray that can hit a box
    dd = arena.direction
    small = jnp.abs(dd) < 1e-30
    d_safe = jnp.where(small, 1.0, dd)
    inv_dir = jnp.where(small, jnp.where(dd < 0, -1e30, 1e30), 1.0 / d_safe)
    # (N, I) slab tests against every instance AABB
    l = (scene.inst_lo[None, :, :] - arena.origin[:, None, :]) * inv_dir[:, None, :]
    u = (scene.inst_hi[None, :, :] - arena.origin[:, None, :]) * inv_dir[:, None, :]
    tnear = jnp.max(jnp.minimum(l, u), axis=-1)
    tfar = jnp.min(jnp.maximum(l, u), axis=-1)
    hit = (
        (tfar > tnear)
        & (tnear > RAY_EPSILON)
        & (tnear < arena.t_max[:, None])
        & (jnp.arange(scene.num_instances)[None, :] != arena.prev[:, None])
    )
    tnear = jnp.where(hit, tnear, FLT_MAX)
    nxt = jnp.argmin(tnear, axis=1).astype(jnp.int32)
    t_entry = jnp.take_along_axis(tnear, nxt[:, None], axis=1)[:, 0]
    found = t_entry < FLT_MAX

    requeue = pending & found
    new_origin = jnp.where(
        requeue[:, None],
        arena.origin + arena.direction * (t_entry * 0.95)[:, None],
        arena.origin,
    )
    new_inst = jnp.where(requeue, nxt, arena.inst)

    # retire rays with nowhere to go
    retire = pending & ~found
    is_shadow = arena.type == int(RayType.SHADOW)
    deposit = retire & is_shadow & (jnp.sum(arena.color**2, axis=-1) > 0.0)
    fb = image_lib.local_add(fb, arena.id, arena.color * arena.w[:, None],
                             jnp.ones_like(arena.w), deposit)
    new_active = arena.active & ~retire

    return arena.replace(origin=new_origin, inst=new_inst,
                         active=new_active), fb


def _cosine_hemisphere(normal: jax.Array, xi: jax.Array) -> jax.Array:
    """CosWeightedRandomHemisphereDirection2 (EmbreeMeshAdapter.cpp:289-318),
    including the reference's unnormalized tangent basis."""
    xi1, xi2 = xi[:, 0], xi[:, 1]
    theta = jnp.arccos(jnp.sqrt(1.0 - xi1))
    phi = 2.0 * jnp.pi * xi2
    xs = jnp.sin(theta) * jnp.cos(phi)
    ys = jnp.cos(theta)
    zs = jnp.sin(theta) * jnp.sin(phi)
    y = normal
    an = jnp.abs(normal)
    h = y + jax.nn.one_hot(jnp.argmin(an, axis=-1), 3, dtype=normal.dtype) * (
        1.0 - jnp.take_along_axis(y, jnp.argmin(an, axis=-1)[:, None], axis=-1)
    )
    # h = y with its smallest-|.| component replaced by 1.0
    x = jnp.cross(h, y)
    z = jnp.cross(x, y)
    d = x * xs[:, None] + y * ys[:, None] + z * zs[:, None]
    return d / _safe_norm(d, keepdims=True)


def _intersect_bvh(scene: SceneData, accel, o_obj, d_obj, ray_mesh, queued,
                   is_shadow=None):
    """Hit query via the Pallas packet-BVH kernel, per-mesh passes.

    Blocks whose lanes contain no rays for mesh m terminate at the root,
    so the per-mesh passes cost ~one node test for foreign blocks. Shadow
    lanes (is_shadow) run a separate ANY-HIT pass (rtcOccluded early-exit,
    EmbreeMeshAdapter.cpp:364-385) — only hit/miss matters for them.
    """
    from gravit_tpu.ops.intersect import Hit
    from gravit_tpu.ops.pallas_bvh import PACKET, bvh_intersect

    n = o_obj.shape[0]
    nb = n // PACKET

    # active-lane compaction: stable-sort lanes by (mesh, shadow-ness),
    # dead lanes last, so live rays pack into few contiguous blocks; the
    # per-mesh passes then traverse ~ceil(live/PACKET) blocks instead of
    # every block that happens to contain a stray live lane (late rounds
    # have <10% scattered occupancy). The sort/gather is cheap elementwise
    # work; the saved traversal is the expensive part.
    shadow_key = (jnp.zeros((n,), jnp.int32) if is_shadow is None
                  else is_shadow.astype(jnp.int32))
    key = jnp.where(queued, ray_mesh * 2 + shadow_key, jnp.int32(2 ** 30))
    perm = jnp.argsort(key, stable=True)
    inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    o_obj = o_obj[perm]
    d_obj = d_obj[perm]
    ray_mesh = ray_mesh[perm]
    queued = queued[perm]
    if is_shadow is not None:
        is_shadow = is_shadow[perm]

    best = Hit(
        t=jnp.full((n,), FLT_MAX, jnp.float32),
        prim=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
    )

    def one_pass(best, valid, any_hit):
        has = jnp.any(valid.reshape(nb, PACKET), axis=1)
        block_root = jnp.where(has, accel.mesh_root[m], -1).astype(jnp.int32)
        t, prim, u, v = bvh_intersect(
            o_obj, d_obj, valid.astype(jnp.int32), block_root,
            accel.bounds, accel.meta, accel.tri, any_hit=any_hit)
        gprim = jnp.where(prim >= 0,
                          accel.leaf2global[jnp.maximum(prim, 0)], -1)
        return Hit(
            t=jnp.where(valid, t, best.t),
            prim=jnp.where(valid, gprim, best.prim),
            u=jnp.where(valid, u, best.u),
            v=jnp.where(valid, v, best.v),
        )

    for m in range(accel.num_meshes):
        mesh_lanes = queued & (ray_mesh == m)
        if is_shadow is None:
            best = one_pass(best, mesh_lanes, False)
        else:
            best = one_pass(best, mesh_lanes & ~is_shadow, False)
            best = one_pass(best, mesh_lanes & is_shadow, True)
    # unsort back to arena lane order
    return Hit(t=best.t[inv_perm], prim=best.prim[inv_perm],
               u=best.u[inv_perm], v=best.v[inv_perm])


def trace_round(scene: SceneData, arena: RayArena, fb: jax.Array,
                round_idx, tile: int, accel=None):
    """One wavefront round: intersect all queued rays, process hits, shuffle."""
    # rays whose instance has no LOCAL mesh data (ray_mesh < 0: foreign
    # domain under the domain scheduler) are untouched this round — they
    # park until the all_to_all migrates them to their owner device
    o_obj, d_obj, ray_mesh = to_object_space(scene, arena)
    queued = arena.active & (arena.inst >= 0) & (ray_mesh >= 0)
    if accel is not None:
        hit = _intersect_bvh(
            scene, accel, o_obj, d_obj, ray_mesh, queued,
            is_shadow=(arena.type == int(RayType.SHADOW)))
    else:
        hit = intersect_closest(
            o_obj, d_obj, ray_mesh, queued,
            scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mesh,
            tile=tile)

    got_hit = queued & (hit.prim >= 0)
    is_shadow = arena.type == int(RayType.SHADOW)

    # --- SHADOW rays: hit -> occluded, drop; miss -> leaves instance ------
    shadow_occluded = got_hit & is_shadow
    shadow_escapes = queued & is_shadow & (hit.prim < 0)

    # --- PRIMARY/SECONDARY miss -> leaves instance ------------------------
    surf = queued & ~is_shadow
    surf_escapes = surf & (hit.prim < 0)

    escapes = shadow_escapes | surf_escapes
    arena = arena.replace(
        prev=jnp.where(escapes, arena.inst, arena.prev),
        inst=jnp.where(escapes, -1, arena.inst),
    )

    # --- PRIMARY/SECONDARY hit: shade + spawn + bounce --------------------
    surf_hits = surf & (hit.prim >= 0)
    arena, fb, spawn = _process_surface_hits(
        scene, arena, fb, hit, surf_hits, round_idx)

    # shadow rays that were occluded die silently (EmbreeMeshAdapter.cpp:492)
    arena = arena.replace(active=arena.active & ~shadow_occluded)

    # --- append spawned shadow rays into free lanes -----------------------
    arena = _append_rays(arena, spawn)

    # --- shuffle pending rays --------------------------------------------
    arena, fb = shuffle(scene, arena, fb)
    return arena, fb


def _process_surface_hits(scene: SceneData, arena: RayArena, fb: jax.Array,
                          hit, mask: jax.Array, round_idx):
    """Hit shading: EmbreeMeshAdapter.cpp:484-607, fully vectorized.

    Returns updated (arena, fb, spawn) where `spawn` is a dict of (N*L)-lane
    shadow-ray candidates with a validity mask.
    """
    n = arena.capacity
    prim = jnp.clip(hit.prim, 0, scene.num_triangles - 1)
    # sanitized hit distance: FLT_MAX on unmasked lanes would produce inf
    # positions whose NaN cotangents poison reverse-mode AD through where()
    t_hit = jnp.where(mask, hit.t, 1.0)
    _, _, normi = _gather_inst(scene, arena.inst)

    # interpolated shading normal: a*u + b*v + c*(1-u-v) with (a,b,c) the
    # normals of corners (1,2,0)  (EmbreeMeshAdapter.cpp:510-521)
    ns = scene.tri_ns[prim]  # (N, 3corners, 3)
    u_, v_ = hit.u[:, None], hit.v[:, None]
    n_interp = ns[:, 1] * u_ + ns[:, 2] * v_ + ns[:, 0] * (1.0 - u_ - v_)
    n_shade = jnp.einsum("nij,nj->ni", normi, n_interp)
    n_shade = n_shade / _safe_norm(n_shade, keepdims=True)

    # flat normal: normalize(normi * -Ng) (cpp:506-508); embree-2 reports the
    # unnormalized Ng = cross(e2, e1) (inward for CCW), so the reference's
    # -Ng is cross(e1, e2) — the outward CCW normal
    ng = jnp.cross(scene.tri_e1[prim], scene.tri_e2[prim])
    n_flat = jnp.einsum("nij,nj->ni", normi, ng)
    n_flat = n_flat / _safe_norm(n_flat, keepdims=True)

    # backface flip uses the FLAT normal (cpp:531-533)
    flip = jnp.sum(-arena.direction * n_flat, axis=-1) <= 0.0
    normal = jnp.where(flip[:, None], -n_shade, n_shade)

    # material: per-vertex color -> lambert(interp color); else per-face; else
    # mesh material (cpp:539-575). tri_kd already face-resolved.
    vcol = scene.tri_vcol[prim]
    ci = (vcol[:, 0] * (1.0 - u_ - v_) + vcol[:, 1] * u_ + vcol[:, 2] * v_)
    has_vc = scene.tri_has_vcol[prim][:, None]
    kd = jnp.where(has_vc, ci, scene.tri_kd[prim])
    ks = scene.tri_ks[prim]
    alpha = scene.tri_alpha[prim]
    mat_type = jnp.where(scene.tri_has_vcol[prim], 0, scene.tri_mat_type[prim])

    # SECONDARY arrival contribution decay: t>1 ? 1/t : t; w *= t  (cpp:570-575)
    is_sec = arena.type == int(RayType.SECONDARY)
    t_decay = jnp.where(t_hit > 1.0, 1.0 / t_hit, t_hit)
    w_now = jnp.where(mask & is_sec, arena.w * t_decay, arena.w)
    arena = arena.replace(w=w_now, t=jnp.where(mask, hit.t, arena.t))

    # ---- shadow spawn per light (generateShadowRays, cpp:320-358) --------
    from gravit_tpu.scene.material import shade_full

    embree_params = None
    if scene.has_embree_materials:
        embree_params = (scene.tri_eta[prim], scene.tri_k[prim],
                         scene.tri_rough[prim], scene.tri_hsc[prim],
                         scene.tri_bs[prim], scene.tri_hsf[prim])

    t_shadow = (1.0 - 16.0 * RAY_EPSILON) * t_hit
    s_origin = arena.origin + arena.direction * t_shadow[:, None]
    hit_point = arena.origin + arena.direction * t_hit[:, None]

    L = scene.num_lights
    spawn = {
        "origin": jnp.zeros((n * L, 3), jnp.float32),
        "direction": jnp.zeros((n * L, 3), jnp.float32),
        "color": jnp.zeros((n * L, 3), jnp.float32),
        "t": jnp.zeros((n * L,), jnp.float32),
        "t_max": jnp.zeros((n * L,), jnp.float32),
        "w": jnp.zeros((n * L,), jnp.float32),
        "id": jnp.zeros((n * L,), jnp.int32),
        "depth": jnp.zeros((n * L,), jnp.int32),
        "inst": jnp.zeros((n * L,), jnp.int32),
        "valid": jnp.zeros((n * L,), jnp.bool_),
    }
    # decorrelation counter for the per-ray hashes: round + bounce depth
    rng_extra = (jnp.uint32(round_idx) * jnp.uint32(2654435761)
                 + arena.depth.astype(jnp.uint32) * jnp.uint32(40503))
    for li in range(L):
        # sample light position (area lights use counter-based per-ray
        # hashes — sharding-invariant, unlike the reference's chunk-seeded
        # xorshift; parity configs use point lights)
        xi = hash_uniform2(arena.id, 11 + li, rng_extra)
        is_area = scene.lights_kind[li] == int(LightKind.AREA)
        lpos_fixed = jnp.broadcast_to(scene.lights_pos[li], (n, 3))
        lpos_area = (
            scene.lights_pos[li]
            + ((xi[:, 0] - 0.5) * scene.lights_wh[li, 0])[:, None] * scene.lights_u[li]
            + ((xi[:, 1] - 0.5) * scene.lights_wh[li, 1])[:, None] * scene.lights_w[li]
        )
        lpos = jnp.where(is_area, lpos_area, lpos_fixed)

        is_ambient = scene.lights_kind[li] == int(LightKind.AMBIENT)
        dist = _safe_norm(lpos - hit_point)
        fall = jnp.minimum(1.0, 1.0 / jnp.maximum(dist, 1e-30))
        li_contrib = jnp.where(
            is_ambient,
            jnp.broadcast_to(scene.lights_color[li], (n, 3)),
            scene.lights_color[li] * fall[:, None],
        )

        wi = lpos - hit_point
        wi = wi / _safe_norm(wi, keepdims=True)
        ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
        valid = mask & (ndotl > 0.0) & jnp.any(li_contrib != 0.0, axis=-1)
        c = shade_full(mat_type, kd, ks, alpha, embree_params,
                       arena.direction, w_now, normal, wi)
        c = jnp.clip(c * li_contrib, 0.0, 1.0)

        sl = slice(li * n, (li + 1) * n)
        sdir = lpos - s_origin  # UNnormalized (cpp:346)
        spawn["origin"] = spawn["origin"].at[sl].set(s_origin)
        spawn["direction"] = spawn["direction"].at[sl].set(sdir)
        spawn["color"] = spawn["color"].at[sl].set(c)
        spawn["t"] = spawn["t"].at[sl].set(t_hit)
        # t_max = dir.length() quirk: glm vec3::length() returns the
        # COMPONENT COUNT (3.0), not the magnitude  (cpp:347,355)
        spawn["t_max"] = spawn["t_max"].at[sl].set(jnp.full((n,), 3.0))
        spawn["w"] = spawn["w"].at[sl].set(w_now)
        spawn["id"] = spawn["id"].at[sl].set(arena.id)
        spawn["depth"] = spawn["depth"].at[sl].set(arena.depth)
        spawn["inst"] = spawn["inst"].at[sl].set(arena.inst)
        spawn["valid"] = spawn["valid"].at[sl].set(valid)

    # ---- Russian-roulette secondary bounce (cpp:577-607) ------------------
    ndepth = arena.depth - 1
    p = 1.0 - hash_uniform(arena.id, 991, rng_extra)
    bounce = mask & (ndepth > 0) & (w_now > p)
    t_sec = (1.0 - 16.0 * jnp.finfo(jnp.float32).eps) * t_hit
    xi = hash_uniform2(arena.id, 992, rng_extra)
    new_dir = _cosine_hemisphere(normal, xi)
    new_origin = arena.origin + arena.direction * t_sec[:, None]
    new_w = w_now * jnp.sum(new_dir * normal, axis=-1)

    arena = arena.replace(
        origin=jnp.where(bounce[:, None], new_origin, arena.origin),
        direction=jnp.where(bounce[:, None], new_dir, arena.direction),
        w=jnp.where(bounce, new_w, w_now),
        depth=jnp.where(bounce, ndepth, arena.depth),
        type=jnp.where(bounce, int(RayType.SECONDARY), arena.type),
        # terminated hits die; bouncing rays stay queued in the same instance
        active=arena.active & (~mask | bounce),
    )
    return arena, fb, spawn


def _append_rays(arena: RayArena, spawn) -> RayArena:
    """Prefix-sum allocation of spawned rays into inactive lanes."""
    c = arena.capacity
    free_slots = jnp.sort(
        jnp.where(~arena.active, jnp.arange(c, dtype=jnp.int32), c))
    rank = jnp.cumsum(spawn["valid"].astype(jnp.int32)) - 1
    slot = jnp.where(
        spawn["valid"],
        free_slots[jnp.clip(rank, 0, c - 1)],
        c,
    )  # index c -> dropped by scatter mode="drop"
    slot = jnp.where(slot >= c, c, slot)

    def put(dst, src):
        return dst.at[slot].set(src, mode="drop")

    return arena.replace(
        origin=put(arena.origin, spawn["origin"]),
        direction=put(arena.direction, spawn["direction"]),
        color=put(arena.color, spawn["color"]),
        t=put(arena.t, spawn["t"]),
        t_max=put(arena.t_max, spawn["t_max"]),
        w=put(arena.w, spawn["w"]),
        id=put(arena.id, spawn["id"]),
        depth=put(arena.depth, spawn["depth"]),
        type=put(arena.type, jnp.full_like(spawn["id"], int(RayType.SHADOW))),
        inst=put(arena.inst, spawn["inst"]),
        prev=put(arena.prev, jnp.full_like(spawn["inst"], -1)),
        active=put(arena.active, spawn["valid"]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_rounds", "unroll", "width", "height"))
def trace_image(scene: SceneData, arena: RayArena, width: int, height: int,
                key: jax.Array | None = None, max_rounds: int = 64,
                unroll: bool = False, accel=None) -> jax.Array:
    """Trace a camera wavefront to completion; returns the framebuffer.

    `unroll=True` runs a fixed `max_rounds` scan (reverse-mode
    differentiable); otherwise a while_loop exits as soon as every queue is
    empty (the SPMD answer to GraviT's MPI_Gather/Scatter termination check).
    """
    if key is None:
        key = jax.random.key(0)
    fb = image_lib.new_framebuffer(width, height)
    tile = _choose_tile(scene.num_triangles)

    arena, fb = shuffle(scene, arena, fb)  # FilterRaysLocally analog

    if unroll:
        def body(carry, r):
            arena, fb = carry
            arena, fb = trace_round(scene, arena, fb, r, tile,
                                    accel=accel)
            return (arena, fb), None
        (arena, fb), _ = jax.lax.scan(
            body, (arena, fb), jnp.arange(max_rounds))
        return fb

    def cond(state):
        r, arena, fb = state
        return (r < max_rounds) & jnp.any(arena.active & (arena.inst >= 0))

    def body(state):
        r, arena, fb = state
        arena, fb = trace_round(scene, arena, fb, r, tile,
                                accel=accel)
        return (r + 1, arena, fb)

    _, arena, fb = jax.lax.while_loop(cond, body, (jnp.int32(0), arena, fb))
    return fb


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _round_step(scene: SceneData, arena: RayArena, fb: jax.Array,
                round_idx, width: int, height: int, accel=None):
    tile = _choose_tile(scene.tri_v0.shape[0])
    arena, fb = trace_round(scene, arena, fb, round_idx, tile, accel=accel)
    live = jnp.sum((arena.active & (arena.inst >= 0)).astype(jnp.int32))
    return arena, fb, live


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _initial_shuffle(scene: SceneData, arena: RayArena, width: int,
                     height: int):
    fb = image_lib.new_framebuffer(width, height)
    arena, fb = shuffle(scene, arena, fb)
    return arena, fb


def trace_image_stepped(scene: SceneData, arena: RayArena, width: int,
                        height: int, key: jax.Array | None = None,
                        max_rounds: int = 64, accel=None,
                        timer=None) -> jax.Array:
    """Host-stepped variant of trace_image: one jit dispatch per round with
    the termination check on the host. Same results; smaller programs
    (useful for per-round profiling via `timer` and for environments where
    very large single programs are fragile)."""
    if key is None:
        key = jax.random.key(0)
    arena, fb = _initial_shuffle(scene, arena, width, height)
    for r in range(max_rounds):
        ctx = timer.phase(f"round{r}") if timer else None
        if ctx:
            ctx.__enter__()
        arena, fb, live = _round_step(
            scene, arena, fb, jnp.int32(r), width, height, accel=accel)
        n_live = int(live)
        if ctx:
            ctx.__exit__(None, None, None)
        if n_live == 0:
            break
    return fb


def make_arena(camera_rays: RayArena, num_lights: int,
               slack: float = 1.25) -> RayArena:
    """Embed camera rays into an arena with room for shadow spawns."""
    n = camera_rays.capacity
    cap = int(n * (1 + max(1, num_lights)) * slack)
    cap = -(-cap // 1024) * 1024
    arena = RayArena.zeros(cap)
    idx = jnp.arange(n)
    return jax.tree.map(lambda dst, src: dst.at[idx].set(src),
                        arena, camera_rays)
