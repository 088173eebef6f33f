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
    if scene.num_instances == 1:
        n = inst.shape[0]
        return (
            jnp.broadcast_to(scene.inst_mesh[0], (n,)),
            jnp.broadcast_to(scene.inst_minv[0], (n, 4, 4)),
            jnp.broadcast_to(scene.inst_normi[0], (n, 3, 3)),
        )
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
    # NOTE: the 3x3 transforms are written as broadcast-multiply + small-axis
    # sums (VPU elementwise fp32), NOT as (N,3)@(3,3) matmuls — XLA lowers
    # real matmuls onto the MXU with bfloat16 operands, which breaks bit
    # parity with the reference goldens.
    mesh_id, minv, _ = _gather_inst(scene, arena.inst)
    o = jnp.einsum("nij,nj->ni", minv[:, :3, :3], arena.origin) + minv[:, :3, 3]
    d = jnp.einsum("nij,nj->ni", minv[:, :3, :3], arena.direction)
    mesh_id = jnp.where(arena.inst >= 0, mesh_id, -1)
    return o, d, mesh_id


def shuffle(scene: SceneData, arena: RayArena, fb: jax.Array,
            initial: bool = True) -> Tuple[RayArena, jax.Array]:
    """Assign each unqueued ray its next instance, or retire it.

    Replicates TracerBase::shuffleRays (TracerBase.h:325-414) non-volume path
    + BVH::intersect leaf semantics (BVH.h:61-135, `update=true` slab test):
    a candidate instance hits iff tfar > tnear AND tnear > RAY_EPSILON AND
    tnear < ray.t_max; the smallest tnear wins; the instance just exited
    (`prev`) is excluded. On a hit the origin is bumped by 0.95*tnear
    (TracerBase.h:394). Retired SHADOW rays with nonzero color deposit
    color*w into the framebuffer (TracerBase.h:396-399).

    initial=False (per-round calls): with a SINGLE instance every pending
    ray just exited that instance (prev == 0), and the prev-exclusion makes
    re-entry impossible — the slab pass is skipped and every pending ray
    retires directly. Exact, not approximate.
    """
    pending = arena.active & (arena.inst < 0)

    if scene.num_instances == 1 and not initial:
        is_shadow = arena.type == int(RayType.SHADOW)
        deposit = pending & is_shadow & (
            jnp.sum(arena.color**2, axis=-1) > 0.0)
        fb = image_lib.local_add(fb, arena.id,
                                 arena.color * arena.w[:, None],
                                 jnp.ones_like(arena.w), deposit)
        return arena.replace(active=arena.active & ~pending), fb

    found, nxt, t_entry = _next_instance(
        scene, arena.origin, arena.direction, arena.t_max, arena.prev,
        pending)
    requeue = pending & found
    new_origin = jnp.where(
        requeue[:, None],
        arena.origin + arena.direction * (t_entry * 0.95)[:, None],
        arena.origin,
    )
    new_inst = jnp.where(requeue, nxt, arena.inst)

    # retire rays with nowhere to go
    retire = pending & ~found
    if not initial:
        is_shadow = arena.type == int(RayType.SHADOW)
        deposit = retire & is_shadow & (
            jnp.sum(arena.color**2, axis=-1) > 0.0)
        fb = image_lib.local_add(fb, arena.id,
                                 arena.color * arena.w[:, None],
                                 jnp.ones_like(arena.w), deposit)
    # initial=True: the wavefront is all-PRIMARY by construction (camera
    # generation; FilterRaysLocally likewise sees no shadows,
    # ImageTracer.h:111-125) — the masked deposit would be a guaranteed
    # no-op, but its full-width framebuffer scatter still costs ~10 ms at
    # 512^2 on v5e, so it is skipped outright
    new_active = arena.active & ~retire

    return arena.replace(origin=new_origin, inst=new_inst,
                         active=new_active), fb


def _next_instance(scene: SceneData, origin, direction, t_max, prev,
                   pending):
    """BVH::intersect leaf semantics (BVH.h:61-135, `update=true` slab):
    the closest instance AABB with tfar > tnear, tnear > RAY_EPSILON,
    tnear < t_max, excluding `prev`. Returns (found, next_inst, t_entry).
    """
    # reciprocal directions: zero components get a big finite value instead
    # of inf so reverse-mode AD stays NaN-free (double-where pattern);
    # forward behavior is unchanged for any ray that can hit a box
    small = jnp.abs(direction) < 1e-30
    d_safe = jnp.where(small, 1.0, direction)
    inv_dir = jnp.where(small, jnp.where(direction < 0, -1e30, 1e30),
                        1.0 / d_safe)
    if scene.inst_bvh is not None:
        # log-time path: stackless skip-link walk over the instance tree
        # (BVH.h:61-135 analog); exact same leaf predicate as the scan
        from gravit_tpu.accel.instance_bvh import closest_instance

        found, nxt, _ = closest_instance(
            scene.inst_bvh, origin, inv_dir, t_max, prev, pending)
        # recompute the winner's t_entry through the differentiable
        # instance table (the tree's node bounds are static copies)
        safe = jnp.clip(nxt, 0, scene.num_instances - 1)
        l1 = (scene.inst_lo[safe] - origin) * inv_dir
        u1 = (scene.inst_hi[safe] - origin) * inv_dir
        t_entry = jnp.where(found,
                            jnp.max(jnp.minimum(l1, u1), axis=-1), FLT_MAX)
        return found, nxt, t_entry
    # brute scan: statically-unrolled loop over instances with a running
    # min, all ops at (N,) lane width. The old (N, I, 3) broadcast put
    # the 3-axis in the MINOR dim (3/128 lane utilization — ~4 ms/round
    # at 262K x 25 on v5e, the largest single sub-stage of a fast-multi
    # round; scripts/micro_multi2.py). Running strict-< keeps the
    # smallest instance index on ties, exactly argmin's behavior.
    I = int(scene.num_instances)
    n = origin.shape[0]
    best_t = jnp.full((n,), FLT_MAX, jnp.float32)
    best_i = jnp.zeros((n,), jnp.int32)
    for i in range(I):
        tn = jnp.full((n,), -FLT_MAX, jnp.float32)
        tf = jnp.full((n,), FLT_MAX, jnp.float32)
        for ax in range(3):
            a = (scene.inst_lo[i, ax] - origin[:, ax]) * inv_dir[:, ax]
            b = (scene.inst_hi[i, ax] - origin[:, ax]) * inv_dir[:, ax]
            tn = jnp.maximum(tn, jnp.minimum(a, b))
            tf = jnp.minimum(tf, jnp.maximum(a, b))
        hit_i = ((tf > tn) & (tn > RAY_EPSILON) & (tn < t_max)
                 & (prev != i))
        closer = hit_i & (tn < best_t)
        best_t = jnp.where(closer, tn, best_t)
        best_i = jnp.where(closer, i, best_i)
    return best_t < FLT_MAX, best_i, best_t


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


# mesh-count crossover between the in-place per-(mesh, shadow) passes and
# the segment-aligned pack inside _intersect_bvh (tests pin both paths by
# overriding this)
INPLACE_MESH_LIMIT = 8


def _intersect_bvh(scene: SceneData, accel, o_obj, d_obj, ray_mesh, queued,
                   is_shadow=None):
    """Hit query via the Pallas packet-BVH kernel.

    Multi-mesh scenes use SEGMENT-ALIGNED compaction: lanes are
    stable-sorted by (mesh, shadow-ness) and scattered into a padded arena
    where every segment starts on a PACKET boundary, so each block
    addresses exactly one (mesh, shadow) pair. The whole wavefront then
    needs at most TWO kernel dispatches — one closest-hit over the primary
    blocks and one ANY-HIT early-exit over the shadow blocks (rtcOccluded
    semantics, EmbreeMeshAdapter.cpp:364-385) — instead of 2 passes per
    mesh streaming the full arena each time. Dead lanes pack last; their
    blocks (and the alignment-padding blocks) get root -1 and are skipped,
    so late low-occupancy rounds traverse ~ceil(live/PACKET) blocks.

    Padding scale: the packed arena is n + 2*M*PACKET lanes (M = local
    mesh count) regardless of segment occupancy — skipped blocks make this
    a memory/dispatch-width cost only. Under the domain scheduler M is the
    PER-DEVICE mesh count (partition_accel), so M stays small even with
    hundreds of domains; a single-device scene with M >> 100 would want
    occupancy-capped padding instead.
    """
    from gravit_tpu.ops.intersect import Hit
    from gravit_tpu.ops.pallas_bvh import PACKET, bvh_intersect

    n = o_obj.shape[0]
    M = accel.num_meshes

    def run(o, d, valid, block_root, any_hit):
        t, prim, u, v = bvh_intersect(
            o, d, valid.astype(jnp.int32), block_root.astype(jnp.int32),
            accel.bounds, accel.meta, accel.tri, any_hit=any_hit)
        gprim = jnp.where(prim >= 0,
                          accel.leaf2global[jnp.maximum(prim, 0)], -1)
        return t, gprim, u, v

    if M == 1:
        # single-mesh: the arena's natural layout (camera rays first,
        # spawns filling freed lanes in index order) is already contiguous;
        # a sort would cost more than it saves
        nb = n // PACKET
        root0 = accel.mesh_root[0]

        def one_pass(best, valid, any_hit):
            has = jnp.any(valid.reshape(nb, PACKET), axis=1)
            block_root = jnp.where(has, root0, -1)
            t, gprim, u, v = run(o_obj, d_obj, valid, block_root, any_hit)
            return Hit(
                t=jnp.where(valid, t, best.t),
                prim=jnp.where(valid, gprim, best.prim),
                u=jnp.where(valid, u, best.u),
                v=jnp.where(valid, v, best.v),
            )

        best = Hit(
            t=jnp.full((n,), FLT_MAX, jnp.float32),
            prim=jnp.full((n,), -1, jnp.int32),
            u=jnp.zeros((n,), jnp.float32),
            v=jnp.zeros((n,), jnp.float32),
        )
        if is_shadow is None:
            return one_pass(best, queued, False)
        best = one_pass(best, queued & ~is_shadow, False)
        return one_pass(best, queued & is_shadow, True)

    # ---- multi-mesh, small M: IN-PLACE per-(mesh, shadow) passes ---------
    # The kernel skips blocks whose root is -1, so a pass for mesh m with
    # valid = (ray_mesh == m) only traverses blocks actually holding
    # mesh-m lanes — with tile-coherent wavefronts those are ~disjoint
    # across meshes, so total kernel work matches the packed dispatch
    # while the pack/unsort glue (one-hot ranks + padded-arena gather +
    # result unsort, ~10 ms/round at 262K on v5e — the r5 micro_multi
    # finding) disappears entirely. Per-lane results are exact closest
    # hits independent of packet composition, so this is bit-equal to
    # the packed path (tests/test_segment_dispatch). Large mesh counts
    # keep the packed path: 2M dispatches would pay 2M grid launches
    # against the pack's fixed cost.
    if M <= INPLACE_MESH_LIMIT:
        nb_ip = n // PACKET
        best = Hit(
            t=jnp.full((n,), FLT_MAX, jnp.float32),
            prim=jnp.full((n,), -1, jnp.int32),
            u=jnp.zeros((n,), jnp.float32),
            v=jnp.zeros((n,), jnp.float32),
        )
        shadow_sets = (((None, False),) if is_shadow is None
                       else ((~is_shadow, False), (is_shadow, True)))
        for mesh_id in range(M):
            mesh_sel = queued & (ray_mesh == mesh_id)
            for sh_mask, ah in shadow_sets:
                sel = mesh_sel if sh_mask is None else (mesh_sel & sh_mask)
                has = jnp.any(sel.reshape(nb_ip, PACKET), axis=1)
                block_root = jnp.where(has, accel.mesh_root[mesh_id], -1)
                t, gprim, u, v = run(o_obj, d_obj, sel, block_root, ah)
                best = Hit(t=jnp.where(sel, t, best.t),
                           prim=jnp.where(sel, gprim, best.prim),
                           u=jnp.where(sel, u, best.u),
                           v=jnp.where(sel, v, best.v))
        return best

    # ---- multi-mesh: segment-aligned packing, <=2 dispatches total -------
    S = 2 * M                         # segments: (mesh, shadow) pairs
    shadow_key = (jnp.zeros((n,), jnp.int32) if is_shadow is None
                  else is_shadow.astype(jnp.int32))
    key = jnp.where(queued, ray_mesh * 2 + shadow_key, jnp.int32(S))
    n_pad = n + S * PACKET                       # worst-case alignment waste

    if S + 1 <= 16:
        # small segment counts: ONE-HOT PREFIX RANKS instead of a stable
        # argsort — sorts cost ~10x a cumsum at arena width on v5e
        # (micro_tpu4.py; the same construction as _pack_exchange). The
        # rank within a segment preserves lane order, which is exactly
        # what the stable sort produced — results are identical.
        onehot = jax.nn.one_hot(key, S + 1, dtype=jnp.int32)
        rank = jnp.cumsum(onehot, axis=0) - onehot   # exclusive per segment
        my_rank = jnp.sum(rank * onehot, axis=1)
        cnt = rank[-1] + onehot[-1]                  # (S+1,) totals
        padded_cnt = ((cnt[:S] + PACKET - 1) // PACKET) * PACKET
        zero1 = jnp.zeros((1,), cnt.dtype)
        off_pad = jnp.concatenate([zero1, jnp.cumsum(padded_cnt)])  # (S+1,)
        dest = off_pad[key] + my_rank                # arena lane -> padded
        lane_of_pad = jnp.full((n_pad,), n, jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
    else:
        perm = jnp.argsort(key, stable=True)     # sorted pos -> arena lane
        key_s = key[perm]

        cnt = jnp.bincount(key, length=S + 1)    # per-segment live counts
        padded_cnt = ((cnt[:S] + PACKET - 1) // PACKET) * PACKET
        zero1 = jnp.zeros((1,), cnt.dtype)
        off_pad = jnp.concatenate([zero1, jnp.cumsum(padded_cnt)])  # (S+1,)
        off_raw = jnp.concatenate([zero1, jnp.cumsum(cnt[:S])])     # (S+1,)
        # sorted position i in segment s lands at off_pad[s] + (i -
        # off_raw[s]); the dead bucket (s == S) packs right after the last
        # aligned segment
        shift = (off_pad - off_raw)[key_s]
        dest_sorted = jnp.arange(n) + shift      # sorted pos -> padded lane
        # place rows by composed-index GATHER: scatter only the int32
        # inverse (padded lane -> sorted pos); row scatters are ~5x dearer
        # than gathers on v5e (scripts/micro_tpu5.py)
        pos_of_pad = jnp.full((n_pad,), n, jnp.int32).at[dest_sorted].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        lane_of_pad = jnp.where(
            pos_of_pad < n, perm[jnp.clip(pos_of_pad, 0, n - 1)], n)
        # arena lane -> padded lane (for the unsort gather below)
        dest = jnp.zeros((n,), jnp.int32).at[perm].set(
            dest_sorted.astype(jnp.int32))
    packed = jnp.concatenate([
        o_obj, d_obj, queued.astype(jnp.float32)[:, None],
    ], axis=1)
    packed1 = jnp.concatenate([packed, jnp.zeros((1, 7), jnp.float32)])
    arena_p = packed1[lane_of_pad]
    o_p, d_p = arena_p[:, 0:3], arena_p[:, 3:6]
    queued_p = arena_p[:, 6] > 0.5

    # per-block segment: segments are PACKET-aligned, so each block belongs
    # to exactly one segment (or the dead/padding tail)
    nbp = n_pad // PACKET
    block_start = jnp.arange(nbp) * PACKET
    blk_seg = jnp.clip(
        jnp.searchsorted(off_pad, block_start, side="right") - 1, 0, S)
    blk_live = (blk_seg < S) & jnp.any(queued_p.reshape(nbp, PACKET), axis=1)
    blk_mesh = jnp.clip(blk_seg // 2, 0, M - 1)
    blk_shadow = (blk_seg % 2) == 1
    blk_root = accel.mesh_root[blk_mesh]

    root_closest = jnp.where(blk_live & ~blk_shadow, blk_root, -1)
    t, prim, u, v = run(o_p, d_p, queued_p, root_closest, False)
    if is_shadow is not None:
        root_any = jnp.where(blk_live & blk_shadow, blk_root, -1)
        t2, prim2, u2, v2 = run(o_p, d_p, queued_p, root_any, True)
        lane_shadow = jnp.repeat(blk_shadow, PACKET)
        t = jnp.where(lane_shadow, t2, t)
        prim = jnp.where(lane_shadow, prim2, prim)
        u = jnp.where(lane_shadow, u2, u)
        v = jnp.where(lane_shadow, v2, v)

    # unsort by composed-index gather: dest[arena lane] = padded lane
    hpack = jnp.stack([t, u, v], axis=1)[dest]
    hprim = prim[dest]
    miss = ~queued | (hpack[:, 0] >= FLT_MAX)
    return Hit(t=jnp.where(miss, FLT_MAX, hpack[:, 0]),
               prim=jnp.where(miss, -1, hprim),
               u=hpack[:, 1], v=hpack[:, 2])


def _pack_shade_table(scene: SceneData) -> jax.Array:
    """Concatenate every per-triangle shading attribute into one (T, K)
    matrix so hit shading costs ONE row-gather instead of ~13 scattered
    1-D gathers (measured ~9x cheaper on TPU; random-index gathers pay a
    large fixed per-op cost). Assembled inside the traced function — the
    concat is differentiable, so vertex/material gradients still flow, and
    XLA hoists it out of the round loop."""
    T = scene.num_triangles
    cols = [
        scene.tri_ns.reshape(T, 9),
        scene.tri_vcol.reshape(T, 9),
        scene.tri_kd, scene.tri_ks,
        scene.tri_e1, scene.tri_e2,
        scene.tri_alpha[:, None],
        scene.tri_mat_type.astype(jnp.float32)[:, None],
        scene.tri_has_vcol.astype(jnp.float32)[:, None],
    ]
    if scene.has_embree_materials:
        cols += [scene.tri_eta, scene.tri_k, scene.tri_rough[:, None],
                 scene.tri_hsc, scene.tri_bs[:, None],
                 scene.tri_hsf[:, None]]
    return jnp.concatenate(cols, axis=1)


def _unpack_shade_row(scene: SceneData, row: jax.Array):
    """Inverse of _pack_shade_table for a gathered (N, K) row block."""
    n = row.shape[0]
    ns = row[:, 0:9].reshape(n, 3, 3)
    vcol = row[:, 9:18].reshape(n, 3, 3)
    kd = row[:, 18:21]
    ks = row[:, 21:24]
    e1 = row[:, 24:27]
    e2 = row[:, 27:30]
    alpha = row[:, 30]
    mat_type = row[:, 31].astype(jnp.int32)
    has_vcol = row[:, 32] > 0.5
    embree = None
    if scene.has_embree_materials:
        embree = (row[:, 33:36], row[:, 36:39], row[:, 39],
                  row[:, 40:43], row[:, 43], row[:, 44])
    return ns, vcol, kd, ks, e1, e2, alpha, mat_type, has_vcol, embree


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

    # --- resolve fresh spawns' occlusion IN THIS ROUND --------------------
    # A spawn lives in the same instance as its parent, so its first
    # any-hit test needs no migration and no arena lane: test the dense
    # spawn matrix directly (the merged shadow dispatch; same result as
    # queueing it for next round, one round sooner and occluded spawns
    # never touch the arena). Survivors append as PENDING with
    # prev=spawn instance so the shuffle routes them onward exactly as
    # an escaped shadow ray (TracerBase.h:325-414).
    spawn = _resolve_spawn_occlusion(scene, arena.capacity, accel, spawn,
                                     tile)
    arena = _append_rays(arena, spawn, pending=True)

    # --- shuffle pending rays --------------------------------------------
    arena, fb = shuffle(scene, arena, fb, initial=False)
    return arena, fb


def _process_surface_hits(scene: SceneData, arena: RayArena, fb: jax.Array,
                          hit, mask: jax.Array, round_idx,
                          no_bounce: bool = False):
    """Hit shading: EmbreeMeshAdapter.cpp:484-607, fully vectorized.

    Returns updated (arena, fb, spawn) where `spawn` is a dict of (N*L)-lane
    shadow-ray candidates with a validity mask.

    no_bounce=True statically removes the Russian-roulette block: on
    depth-1 wavefronts (the fast paths' contract) `depth-1 > 0` is false
    on every lane, so the bounce is a guaranteed no-op — but its cosine-
    hemisphere transcendentals and hashes would still run at full width.
    """
    n = arena.capacity
    prim = jnp.clip(hit.prim, 0, scene.num_triangles - 1)
    # sanitized hit distance: FLT_MAX on unmasked lanes would produce inf
    # positions whose NaN cotangents poison reverse-mode AD through where()
    t_hit = jnp.where(mask, hit.t, 1.0)
    _, _, normi = _gather_inst(scene, arena.inst)

    # ONE row-gather of every per-triangle shading attribute (see
    # _pack_shade_table); ~9x cheaper than separate gathers on TPU
    row = _pack_shade_table(scene)[prim]
    (ns, vcol, kd_face, ks, tri_e1, tri_e2, alpha, mat_type_face,
     has_vc1, embree_rows) = _unpack_shade_row(scene, row)

    # interpolated shading normal: a*u + b*v + c*(1-u-v) with (a,b,c) the
    # normals of corners (1,2,0)  (EmbreeMeshAdapter.cpp:510-521).
    # Single-instance scenes use COLUMN form: reductions over a size-3
    # minor axis (einsums, norms, dots) run at 3/128 lane utilization on
    # the VPU, and writing them as (N,) sums cut the bunny megapass
    # 16.1 -> 15.2 ms device. The SAME rewrite REGRESSED the
    # multi-instance frame by ~12 ms (fusion-context sensitivity, like
    # both r5 compaction attempts), so multi-instance scenes keep the
    # einsum form — the static num_instances gate picks per scene. The
    # forms differ by fma association only (CPU golden max byte err
    # 0 -> 1 on the column form; hardware goldens unchanged).
    col_form = scene.num_instances == 1
    if col_form:
        u1, v1 = hit.u, hit.v
        w1 = 1.0 - u1 - v1
        ni_c = [ns[:, 1, c] * u1 + ns[:, 2, c] * v1 + ns[:, 0, c] * w1
                for c in range(3)]
        nsh = [normi[:, i, 0] * ni_c[0] + normi[:, i, 1] * ni_c[1]
               + normi[:, i, 2] * ni_c[2] for i in range(3)]
        nsh_n = jnp.sqrt(jnp.maximum(
            nsh[0] * nsh[0] + nsh[1] * nsh[1] + nsh[2] * nsh[2], 1e-30))
        nsh = [c / nsh_n for c in nsh]
        e1c = [tri_e1[:, c] for c in range(3)]
        e2c = [tri_e2[:, c] for c in range(3)]
        # -Ng = cross(e1, e2), the outward CCW normal (cpp:506-508)
        ngc = [e1c[1] * e2c[2] - e1c[2] * e2c[1],
               e1c[2] * e2c[0] - e1c[0] * e2c[2],
               e1c[0] * e2c[1] - e1c[1] * e2c[0]]
        nfl = [normi[:, i, 0] * ngc[0] + normi[:, i, 1] * ngc[1]
               + normi[:, i, 2] * ngc[2] for i in range(3)]
        nfl_n = jnp.sqrt(jnp.maximum(
            nfl[0] * nfl[0] + nfl[1] * nfl[1] + nfl[2] * nfl[2], 1e-30))
        nfl = [c / nfl_n for c in nfl]
        # backface flip uses the FLAT normal (cpp:531-533)
        dir_c = [arena.direction[:, c] for c in range(3)]
        flip = ((-dir_c[0]) * nfl[0] + (-dir_c[1]) * nfl[1]
                + (-dir_c[2]) * nfl[2]) <= 0.0
        normal_c = [jnp.where(flip, -c, c) for c in nsh]
        normal = jnp.stack(normal_c, axis=1)
        u1v = u1
        u_, v_ = u1[:, None], v1[:, None]
    else:
        u_, v_ = hit.u[:, None], hit.v[:, None]
        n_interp = (ns[:, 1] * u_ + ns[:, 2] * v_
                    + ns[:, 0] * (1.0 - u_ - v_))
        n_shade = jnp.einsum("nij,nj->ni", normi, n_interp)
        n_shade = n_shade / _safe_norm(n_shade, keepdims=True)
        # flat normal: normalize(normi * -Ng) (cpp:506-508); embree-2
        # reports the unnormalized Ng = cross(e2, e1) (inward for CCW),
        # so the reference's -Ng is cross(e1, e2) — the outward CCW
        # normal
        ng = jnp.cross(tri_e1, tri_e2)
        n_flat = jnp.einsum("nij,nj->ni", normi, ng)
        n_flat = n_flat / _safe_norm(n_flat, keepdims=True)
        # backface flip uses the FLAT normal (cpp:531-533)
        flip = jnp.sum(-arena.direction * n_flat, axis=-1) <= 0.0
        normal = jnp.where(flip[:, None], -n_shade, n_shade)
        normal_c = [normal[:, c] for c in range(3)]

    # material: per-vertex color -> lambert(interp color); else per-face; else
    # mesh material (cpp:539-575). tri_kd already face-resolved.
    ci = (vcol[:, 0] * (1.0 - u_ - v_) + vcol[:, 1] * u_ + vcol[:, 2] * v_)
    kd = jnp.where(has_vc1[:, None], ci, kd_face)
    mat_type = jnp.where(has_vc1, 0, mat_type_face)

    # SECONDARY arrival contribution decay: t>1 ? 1/t : t; w *= t  (cpp:570-575)
    is_sec = arena.type == int(RayType.SECONDARY)
    t_decay = jnp.where(t_hit > 1.0, 1.0 / t_hit, t_hit)
    w_now = jnp.where(mask & is_sec, arena.w * t_decay, arena.w)
    arena = arena.replace(w=w_now, t=jnp.where(mask, hit.t, arena.t))

    # ---- shadow spawn per light (generateShadowRays, cpp:320-358) --------
    from gravit_tpu.scene.material import shade_full

    embree_params = embree_rows

    t_shadow = (1.0 - 16.0 * RAY_EPSILON) * t_hit
    s_origin = arena.origin + arena.direction * t_shadow[:, None]
    hit_point = arena.origin + arena.direction * t_hit[:, None]

    L = scene.num_lights
    spawn_rows = []
    # decorrelation counter for the per-ray hashes: round + bounce depth.
    # round_idx may be a scalar (looped tracer: the wavefront round) or a
    # per-lane (N,) array (fast-multi passes each ray's RECORDED freeze
    # round so area-light sample hashes match the looped tracer exactly —
    # the r4 gate excluded area lights because this collapsed to 0)
    rng_extra = (jnp.asarray(round_idx).astype(jnp.uint32)
                 * jnp.uint32(2654435761)
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
        if col_form:
            # column form (see the normals block)
            dv = [lpos[:, c] - hit_point[:, c] for c in range(3)]
            dist = jnp.sqrt(jnp.maximum(
                dv[0] * dv[0] + dv[1] * dv[1] + dv[2] * dv[2], 1e-30))
            fall = jnp.minimum(1.0, 1.0 / jnp.maximum(dist, 1e-30))
            wi_c = [c / dist for c in dv]
            ndotl = jnp.maximum(0.0, normal_c[0] * wi_c[0]
                                + normal_c[1] * wi_c[1]
                                + normal_c[2] * wi_c[2])
            wi = jnp.stack(wi_c, axis=1)
        else:
            dist = _safe_norm(lpos - hit_point)
            fall = jnp.minimum(1.0, 1.0 / jnp.maximum(dist, 1e-30))
            wi = lpos - hit_point
            wi = wi / _safe_norm(wi, keepdims=True)
            ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
        li_contrib = jnp.where(
            is_ambient,
            jnp.broadcast_to(scene.lights_color[li], (n, 3)),
            scene.lights_color[li] * fall[:, None],
        )
        valid = mask & (ndotl > 0.0) & jnp.any(li_contrib != 0.0, axis=-1)
        c = shade_full(mat_type, kd, ks, alpha, embree_params,
                       arena.direction, w_now, normal, wi,
                       has_specular=scene.has_specular)
        c = jnp.clip(c * li_contrib, 0.0, 1.0)

        sdir = lpos - s_origin  # UNnormalized (cpp:346)
        # one packed (N, 16) row per light; _append_rays scatters the whole
        # matrix in ONE op. int fields ride as float32 (exact to 2^24 —
        # pixel ids up to a 16.7-Mpixel film, depths/instances are small).
        # t_max = dir.length() quirk: glm vec3::length() returns the
        # COMPONENT COUNT (3.0), not the magnitude  (cpp:347,355)
        spawn_rows.append(jnp.concatenate([
            s_origin, sdir, c,
            t_hit[:, None],
            jnp.full((n, 1), 3.0, jnp.float32),
            w_now[:, None],
            arena.id.astype(jnp.float32)[:, None],
            arena.depth.astype(jnp.float32)[:, None],
            arena.inst.astype(jnp.float32)[:, None],
            valid.astype(jnp.float32)[:, None],
        ], axis=1))

    # ---- Russian-roulette secondary bounce (cpp:577-607) ------------------
    if no_bounce:
        arena = arena.replace(active=arena.active & ~mask)
    else:
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
            # terminated hits die; bouncing rays stay queued in place
            active=arena.active & (~mask | bounce),
        )
    spawn = (jnp.concatenate(spawn_rows, axis=0) if spawn_rows
             else jnp.zeros((0, 16), jnp.float32))
    return arena, fb, spawn


def _resolve_spawn_occlusion(scene: SceneData, capacity: int, accel,
                             spawn: jax.Array, tile: int) -> jax.Array:
    """Occlusion-test the packed spawn matrix against each spawn's own
    instance; invalidate occluded rows. rtcOccluded semantics
    (EmbreeMeshAdapter.cpp:364-385) executed at spawn time."""
    m = spawn.shape[0]
    if m == 0:
        return spawn
    valid = spawn[:, 15] > 0.5
    inst = spawn[:, 14].astype(jnp.int32)
    mesh_id, minv, _ = _gather_inst(scene, inst)
    o = jnp.einsum("nij,nj->ni", minv[:, :3, :3], spawn[:, 0:3]) \
        + minv[:, :3, 3]
    d = jnp.einsum("nij,nj->ni", minv[:, :3, :3], spawn[:, 3:6])
    ray_mesh = jnp.where(valid, mesh_id, -1)
    queued = valid & (ray_mesh >= 0)
    if accel is not None:
        from gravit_tpu.ops.pallas_bvh import PACKET

        if m % PACKET:
            pad = PACKET - m % PACKET
            z = lambda a, fill=0: jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
            hit = _intersect_bvh(
                scene, accel, z(o), z(d), z(ray_mesh, -1), z(queued, False),
                is_shadow=jnp.ones((m + pad,), bool))
        else:
            hit = _intersect_bvh(scene, accel, o, d, ray_mesh, queued,
                                 is_shadow=jnp.ones((m,), bool))
    else:
        hit = intersect_closest(
            o, d, ray_mesh, queued,
            scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mesh,
            tile=tile)
    occluded = queued & (hit.prim[:m] >= 0)
    new_valid = valid & ~occluded
    return jnp.concatenate(
        [spawn[:, :15], new_valid.astype(jnp.float32)[:, None]], axis=1)


def _append_rays(arena: RayArena, spawn: jax.Array,
                 pending: bool = False) -> RayArena:
    """Prefix-sum allocation of spawned rays into inactive lanes.

    `spawn` is the packed (M, 16) matrix from _process_surface_hits
    [origin 0:3 | dir 3:6 | color 6:9 | t 9 | t_max 10 | w 11 | id 12 |
     depth 13 | inst 14 | valid 15]. The whole matrix lands in the arena
    with ONE scatter into a staging buffer; per-field merges are then
    elementwise selects (random-index scatters are expensive on TPU,
    elementwise passes are nearly free).
    """
    c = arena.capacity
    if spawn.shape[0] == 0:
        return arena
    valid = spawn[:, 15] > 0.5
    # allocate from the TOP of the arena (descending): camera rays occupy the
    # bottom, so spawns land in one contiguous high region instead of
    # scattering into just-retired low lanes — keeps live lanes block-compact
    # for the BVH kernel. The k-th-free-lane-from-the-top map is built with a
    # reversed cumsum + one scatter instead of a full sort (TPU sorts are
    # ~10x the cost of a cumsum at this width; measured in micro_tpu4.py).
    inact = ~arena.active
    rank_top = jnp.cumsum(inact[::-1].astype(jnp.int32))[::-1] - 1
    # land the rows by GATHER, not row-scatter: ONE int32 scatter builds
    # rank -> spawn-row, then each free lane gathers its row through its
    # own free-rank. A direct (c, 16) row scatter costs ~41 ms at this
    # width on v5e vs ~8 ms for int-scatter + gather (micro_tpu5.py).
    m = spawn.shape[0]
    vrank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    row_of_rank = jnp.full((m,), m, jnp.int32).at[
        jnp.where(valid, vrank, m)].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    # rank_top <= c-1 <= m-1 (m = c * num_lights); ranks with no valid
    # spawn hit the fill value m -> lane stays unwritten
    src_row = jnp.where(inact, row_of_rank[jnp.clip(rank_top, 0, m - 1)], m)
    written = src_row < m
    buf = spawn[jnp.clip(src_row, 0, m - 1)]

    def sel(col, old):
        return jnp.where(written, col, old)

    w3 = written[:, None]
    return arena.replace(
        origin=jnp.where(w3, buf[:, 0:3], arena.origin),
        direction=jnp.where(w3, buf[:, 3:6], arena.direction),
        color=jnp.where(w3, buf[:, 6:9], arena.color),
        t=sel(buf[:, 9], arena.t),
        t_max=sel(buf[:, 10], arena.t_max),
        w=sel(buf[:, 11], arena.w),
        id=sel(buf[:, 12].astype(jnp.int32), arena.id),
        depth=sel(buf[:, 13].astype(jnp.int32), arena.depth),
        type=sel(jnp.int32(int(RayType.SHADOW)), arena.type),
        # pending=True: the spawn was already occlusion-tested against its
        # own instance; it enters as an ESCAPED shadow (inst=-1, prev=its
        # instance) for the same-round shuffle to route onward
        inst=sel(jnp.int32(-1) if pending
                 else buf[:, 14].astype(jnp.int32), arena.inst),
        prev=sel(buf[:, 14].astype(jnp.int32) if pending
                 else jnp.int32(-1), arena.prev),
        active=arena.active | written,
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


def _tile_remap(rays: RayArena, width: int, height: int, T: int):
    """Remap row-major camera lanes into T x T film tiles (tight packet
    frusta for the BVH kernel). Pure static transposes; _tile_unmap
    inverts at deposit time."""
    n0 = rays.capacity

    def to_tiles(a):
        rest = a.shape[1:]
        return (a.reshape((height // T, T, width // T, T) + rest)
                .transpose((0, 2, 1, 3) + tuple(
                    4 + i for i in range(len(rest))))
                .reshape((n0,) + rest))

    return jax.tree.map(to_tiles, rays)


def _per_lane_to_fb(fb, per_lane, n0: int, samples: int, tiled: bool,
                    width: int, height: int, T: int):
    """(n_lanes, 4) per-lane rgba -> framebuffer add: the camera emits
    lanes in ((j*W+i)*S+k)*S+s order, so pixel == lane // S^2 (tiled
    films additionally undo the tile permutation) — no pixel-id scatter
    anywhere (a 262K-row scatter costs ~15 ms/frame at 512^2 on v5e,
    scripts/micro_stages.py)."""
    ss = samples * samples
    n_pix = fb.shape[0]
    if tiled:
        # undo the tile permutation: lane (tr, tc, r, c) -> pixel row
        # tr*T + r, col tc*T + c
        per_pixel = (per_lane[:n0]
                     .reshape(height // T, width // T, T, T, 4)
                     .transpose(0, 2, 1, 3, 4)
                     .reshape(n_pix, 4))
    else:
        per_pixel = (per_lane[:n_pix * ss]
                     .reshape(n_pix, ss, 4).sum(axis=1))
    return fb + per_pixel


def _dense_spawn_deposit(fb, spawn, deposit, n_lanes: int, n0: int,
                         samples: int, tiled: bool, width: int, height: int,
                         T: int):
    """Whole-film dense shadow deposit: spawn row li*n + lane maps back
    to its lane by reshape, then _per_lane_to_fb's dense add."""
    m = spawn.shape[0]
    color = spawn[:, 6:9]
    rgba = jnp.concatenate(
        [color * spawn[:, 11:12], jnp.ones((m, 1), jnp.float32)], axis=1)
    rgba = jnp.where(deposit[:, None], rgba, 0.0)
    per_lane = rgba.reshape(m // n_lanes, n_lanes, 4).sum(axis=0)
    return _per_lane_to_fb(fb, per_lane, n0, samples, tiled, width,
                           height, T)


def _live_first_sel(live, thresh: int):
    """First `thresh` lane indices in (live-first, stable lane order) —
    exactly the order `jnp.argsort(~live, stable=True)[:thresh]`
    produces, built from two cumsums + one int scatter instead of a sort
    (sorts are ~10x a cumsum at arena width, scripts/micro_tpu4.py)."""
    n = live.shape[0]
    li = live.astype(jnp.int32)
    rank_live = jnp.cumsum(li) - li
    dead = 1 - li
    rank_dead = jnp.cumsum(dead) - dead
    n_live = rank_live[-1] + li[-1]
    pos = jnp.where(live, rank_live, n_live + rank_dead)
    return jnp.zeros((thresh,), jnp.int32).at[
        jnp.where(pos < thresh, pos, thresh)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")



@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_rounds", "samples",
                     "tile_order", "dense_deposit"))
def trace_image_fast_multi(scene: SceneData, rays: RayArena, width: int,
                           height: int, accel=None, max_rounds: int = 64,
                           samples: int = 1, tile_order: bool = True,
                           dense_deposit: bool = True) -> jax.Array:
    """Multi-instance depth-1 megapass: resolve the frame in THREE dense
    phases instead of interleaved wavefront rounds.

      A. closest-hit loop over the CAMERA wavefront only (capacity = N,
         no spawn slack): rays that hit an instance freeze with their hit
         recorded; misses hop to the next instance via the 0.95-bump
         shuffle. Late rounds shrink to the unresolved tail.
      B. ONE dense shade+spawn pass over all frozen hits (depth-1 rays
         never re-shade, so one pass is exact).
      C. any-hit loop over the dense (light, lane) spawn matrix: occluded
         rows die, escapes hop instances until they clear the scene, then
         deposit densely (no pixel-id scatter, no arena lanes ever).

    Exactly equivalent to trace_image when no ray can Russian-roulette
    bounce (camera max_depth == 1); callers gate on that and fall back to
    trace_image otherwise. Area lights included: phase A records each
    ray's freeze round (`hitr`) and phase B seeds the light-sample hashes
    with it, reproducing the looped tracer's per-round RNG exactly (the
    r4 gate's round-seed collapse). vs the looped tracer this deletes
    the (1+L)x arena slack, the per-round spawn free-lane scatter, and
    the shadow/primary round interleave — the multi-instance analog of
    trace_image_fast's straight-lining.

    Same fast-adapter-under-every-scene property as the reference
    (EmbreeMeshAdapter.cpp:436-622 runs identically under every tracer).
    """
    from gravit_tpu.ops.intersect import Hit
    from gravit_tpu.ops.pallas_bvh import PACKET

    fb = image_lib.new_framebuffer(width, height)
    n0 = rays.capacity
    dense_deposit = (dense_deposit
                     and n0 == width * height * samples * samples)
    T = int(PACKET ** 0.5)
    tiled = (tile_order and dense_deposit and samples == 1
             and n0 == width * height
             and width % T == 0 and height % T == 0)
    if tiled:
        rays = _tile_remap(rays, width, height, T)
    if n0 % PACKET:
        pad = PACKET - n0 % PACKET
        rays = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), rays)

    arena, fb = shuffle(scene, rays, fb)        # FilterRaysLocally analog
    n = arena.capacity
    tile = _choose_tile(scene.num_triangles)

    def closest(o_obj, d_obj, mesh, queued, is_shadow=None):
        if accel is not None:
            return _intersect_bvh(scene, accel, o_obj, d_obj, mesh, queued,
                                  is_shadow=is_shadow)
        return intersect_closest(
            o_obj, d_obj, mesh, queued,
            scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mesh,
            tile=tile)

    # ---- phase A: per-ray closest-hit resolution -------------------------
    # Two stages: full-width rounds run only while MORE than n//8 rays are
    # still hopping; the surviving tail (grazing rays can hop >32
    # instances) then compacts into an n//8 arena so its many low-
    # occupancy rounds pay 1/8 of the per-round glue (packing, shuffle,
    # selects all scale with arena width). Per-ray math is independent of
    # lane position/packet composition, so results are unchanged.
    hit0 = Hit(t=jnp.full((n,), FLT_MAX, jnp.float32),
               prim=jnp.full((n,), -1, jnp.int32),
               u=jnp.zeros((n,), jnp.float32),
               v=jnp.zeros((n,), jnp.float32))
    hitr0 = jnp.zeros((n,), jnp.int32)
    thresh = -(-max(PACKET, n // 8) // PACKET) * PACKET

    def a_body(state):
        r, arena, hit, hitr = state
        o_obj, d_obj, mesh = to_object_space(scene, arena)
        queued = arena.active & (arena.inst >= 0) & (mesh >= 0)
        h = closest(o_obj, d_obj, mesh, queued)
        got = queued & (h.prim >= 0)
        hit = Hit(t=jnp.where(got, h.t, hit.t),
                  prim=jnp.where(got, h.prim, hit.prim),
                  u=jnp.where(got, h.u, hit.u),
                  v=jnp.where(got, h.v, hit.v))
        # record each ray's FREEZE round: camera rays hop one instance per
        # looped round, so hop-loop iteration r IS the wavefront round the
        # looped tracer would shade this hit in — phase B seeds the light-
        # sample hashes with it (bit-equality for area lights)
        hitr = jnp.where(got, r, hitr)
        escapes = queued & (h.prim < 0)
        # hit lanes FREEZE (active=False, inst kept for phase B's normi
        # gather); escaped lanes hop via the 0.95-bump requeue
        arena = arena.replace(
            prev=jnp.where(escapes, arena.inst, arena.prev),
            inst=jnp.where(escapes, -1, arena.inst),
            active=arena.active & ~got,
        )
        pending = arena.active & (arena.inst < 0)
        found, nxt, t_entry = _next_instance(
            scene, arena.origin, arena.direction, arena.t_max, arena.prev,
            pending)
        requeue = pending & found
        arena = arena.replace(
            origin=jnp.where(requeue[:, None],
                             arena.origin
                             + arena.direction * (t_entry * 0.95)[:, None],
                             arena.origin),
            inst=jnp.where(requeue, nxt, arena.inst),
            active=arena.active & ~(pending & ~found),
        )
        return r + 1, arena, hit, hitr

    def live_count(arena):
        return jnp.sum(arena.active.astype(jnp.int32))

    # stage 1: full width while the live set is too big to compact
    def a1_cond(state):
        r, arena, hit, hitr = state
        return (r < max_rounds) & (live_count(arena) > thresh)

    r, arena, hit, hitr = jax.lax.while_loop(
        a1_cond, a_body, (jnp.int32(0), arena, hit0, hitr0))

    # stage 2: compact live lanes (guaranteed <= thresh) and finish there
    live = arena.active
    sel = _live_first_sel(live, thresh)           # live lanes first
    arena_s = jax.tree.map(lambda a: a[sel], arena)
    hit_s = jax.tree.map(lambda a: a[sel], hit)

    def a2_cond(state):
        r, arena_s, hit_s, hitr_s = state
        return (r < max_rounds) & jnp.any(arena_s.active)

    r, arena_s, hit_s, hitr_s = jax.lax.while_loop(
        a2_cond, a_body, (r, arena_s, hit_s, hitr[sel]))
    # scatter the tail's state back to the original lanes
    arena = jax.tree.map(lambda big, small: big.at[sel].set(small),
                         arena, arena_s)
    hit = jax.tree.map(lambda big, small: big.at[sel].set(small),
                       hit, hit_s)
    hitr = hitr.at[sel].set(hitr_s)

    # ---- phases B + C ------------------------------------------------------
    # NEGATIVE RESULT (r5, measured on v5e): compacting B + C to an n/2
    # rank-ordered width made the frame SLOWER (58.6 vs 52.4 ms device on
    # simple 25-inst): the any-hit kernel already skips blocks with no
    # valid lanes, so its work never halved, while the rank reorder broke
    # the film-tile packet frusta (looser node unions) and the
    # compaction/expansion gathers added glue. Recorded so it is not
    # retried blindly; both phases run at full width, in film-tile order.
    resolved = hit.prim >= 0
    arena = arena.replace(active=resolved)
    L = int(scene.num_lights)
    if L == 0:
        return image_lib.clamp_rgb(fb)

    if dense_deposit:
        spawn, dep = _multi_resolve(scene, fb, arena, hit, hitr,
                                    closest, max_rounds)
        per_lane = _spawn_rgba(spawn, dep).reshape(L, n, 4).sum(axis=0)
        fb = _per_lane_to_fb(fb, per_lane, n0, samples, tiled,
                             width, height, T)
    else:
        spawn, dep = _multi_resolve(scene, fb, arena, hit, hitr,
                                    closest, max_rounds)
        m = spawn.shape[0]
        fb = image_lib.local_add(
            fb, spawn[:, 12].astype(jnp.int32),
            spawn[:, 6:9] * spawn[:, 11:12],
            jnp.ones((m,), jnp.float32), dep)
    return image_lib.clamp_rgb(fb)


def _spawn_rgba(spawn, deposit):
    """(m, 4) rgba rows for depositing spawn contributions (color*w, 1)."""
    m = spawn.shape[0]
    rgba = jnp.concatenate(
        [spawn[:, 6:9] * spawn[:, 11:12], jnp.ones((m, 1), jnp.float32)],
        axis=1)
    return jnp.where(deposit[:, None], rgba, 0.0)


def _multi_resolve(scene, fb, arena, hit, hitr, closest, max_rounds):
    """fast-multi phases B + C at the CALLER's width: one dense shade +
    spawn over the resolved hits, then the shadow any-hit hop loop
    (full-width rounds while > m//8 rows live, compacted tail after).
    Returns (spawn, deposit_mask)."""
    from gravit_tpu.ops.pallas_bvh import PACKET

    arena, fb, spawn = _process_surface_hits(
        scene, arena, fb, hit, arena.active, hitr, no_bounce=True)

    m = spawn.shape[0]
    s_valid = spawn[:, 15] > 0.5
    s_origin0 = spawn[:, 0:3]
    s_dir0 = spawn[:, 3:6]
    s_tmax0 = spawn[:, 10]                       # the glm length()=3.0 quirk
    s_inst0 = spawn[:, 14].astype(jnp.int32)
    c_thresh = -(-max(PACKET, m // 8) // PACKET) * PACKET

    def c_body_at(s_dir, s_tmax, valid, mm):
        def c_body(state):
            r, origin, inst, prev, dead, done = state
            live = valid & ~dead & ~done
            mesh_id, minv, _ = _gather_inst(scene, inst)
            o_obj = jnp.einsum("nij,nj->ni", minv[:, :3, :3], origin) \
                + minv[:, :3, 3]
            d_obj = jnp.einsum("nij,nj->ni", minv[:, :3, :3], s_dir)
            mesh = jnp.where(inst >= 0, mesh_id, -1)
            queued = live & (inst >= 0) & (mesh >= 0)
            h = closest(o_obj, d_obj, mesh, queued,
                        is_shadow=jnp.ones((mm,), bool))
            occluded = queued & (h.prim >= 0)
            dead = dead | occluded
            escapes = queued & (h.prim < 0)
            prev = jnp.where(escapes, inst, prev)
            inst = jnp.where(escapes, -1, inst)
            pending = valid & ~dead & ~done & (inst < 0)
            found, nxt, t_entry = _next_instance(
                scene, origin, s_dir, s_tmax, prev, pending)
            requeue = pending & found
            origin = jnp.where(
                requeue[:, None],
                origin + s_dir * (t_entry * 0.95)[:, None], origin)
            inst = jnp.where(requeue, nxt, inst)
            done = done | (pending & ~found)     # escaped the whole scene
            return r + 1, origin, inst, prev, dead, done
        return c_body

    def c_live(state, valid):
        _, _, _, _, dead, done = state
        return valid & ~dead & ~done

    state0 = (jnp.int32(0), s_origin0, s_inst0,
              jnp.full((m,), -1, jnp.int32),
              jnp.zeros((m,), bool), jnp.zeros((m,), bool))
    c1_body = c_body_at(s_dir0, s_tmax0, s_valid, m)
    state = jax.lax.while_loop(
        lambda s: (s[0] < max_rounds)
        & (jnp.sum(c_live(s, s_valid).astype(jnp.int32)) > c_thresh),
        c1_body, state0)

    livec = c_live(state, s_valid)
    sel_c = _live_first_sel(livec, c_thresh)
    small = tuple(a[sel_c] for a in state[1:])
    c2_body = c_body_at(s_dir0[sel_c], s_tmax0[sel_c], s_valid[sel_c],
                        c_thresh)
    state_s = jax.lax.while_loop(
        lambda s: (s[0] < max_rounds)
        & jnp.any(c_live(s, s_valid[sel_c])),
        c2_body, (state[0],) + small)
    dead = state[4].at[sel_c].set(state_s[4])
    done = state[5].at[sel_c].set(state_s[5])

    deposit = (s_valid & ~dead & done
               & (jnp.sum(spawn[:, 6:9] ** 2, axis=-1) > 0.0))
    return spawn, deposit


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "dense_deposit",
                                    "samples", "tile_order", "max_depth"))
def trace_image_fast(scene: SceneData, rays: RayArena, width: int,
                     height: int, accel=None,
                     dense_deposit: bool = True,
                     samples: int = 1,
                     tile_order: bool = True,
                     max_depth: int = 1) -> jax.Array:
    """Single-instance megapass: the whole frame in max_depth+1 dense
    intersection dispatches (one closest-hit per bounce GENERATION over
    the camera-lane wavefront, then ONE any-hit over every generation's
    spawned shadow rays together) with zero arena churn.

    Exactly equivalent to trace_image for any camera max_depth on a
    single-instance scene: with one instance, a ray that Russian-roulette
    bounces (EmbreeMeshAdapter.cpp:584-607) re-traces IN PLACE the very
    next looped round (it cannot hop domains), so generation g's hits
    land exactly at looped round g — the generation index seeds the RNG
    (RR probability, cosine hemisphere, area-light samples) identically,
    and bounced lanes keep their lane ( = pixel) for the dense deposit.
    Straight-lining the K generations deletes the per-round costs that
    dominate the looped tracer (spawn free-lane allocation, arena-wide
    selects over (1+L)x capacity lanes, shadow/primary interleave) — the
    round-2 "glue gap", now for arbitrary depth (VERDICT r4 missing #2).
    The K*L*N shadow spawns resolve in ONE any-hit dispatch; dead rows'
    PACKET blocks are skipped by the kernel, so late-generation
    sparseness costs only VPU-width glue.

    `rays` is the raw camera wavefront (make_arena not needed). Callers
    gate on `scene.num_instances == 1` (renderer caps the static unroll
    at max_depth <= 6) and fall back to trace_image otherwise.
    `dense_deposit=True` (default) additionally requires a samples==1
    film (lane i == pixel i); pass False for multi-sample wavefronts,
    which deposit through the general pixel-id scatter.
    """
    from gravit_tpu.ops.pallas_bvh import PACKET

    fb = image_lib.new_framebuffer(width, height)
    n0 = rays.capacity

    # tile ordering: a PACKET block of row-major lanes is two full film
    # rows — a long thin frustum whose BVH-node union is large. Remapping
    # lanes into sqrt(PACKET)-square film tiles makes each block a tight
    # frustum (fewer node visits for BOTH kernel passes; shadow spawns
    # inherit the parent lane's tile). Pure static transposes, inverted at
    # deposit time. Only meaningful for whole-film samples==1 wavefronts
    # (the dense-deposit contract).
    #
    # Golden-validated on hardware 2026-08-21 (frac 1.9e-5, max 1 byte —
    # the same skew as the stepped path) after the MXU-bf16 shadow
    # transform fix below; 57.1 vs 67.2 ms/frame on bunny 512². An
    # earlier divergence blamed on tiling was entirely that transform
    # bug (tiled and untiled produced the identical 13%-pixel diff).
    # the dense-deposit contract is checkable statically: the wavefront
    # must cover the whole film (n0 == W*H*S^2 lanes in camera order).
    # Subwindow / cropped wavefronts fall back to the pixel-id scatter
    # automatically.
    dense_deposit = (dense_deposit
                     and n0 == width * height * samples * samples)
    T = int(PACKET ** 0.5)
    tiled = (tile_order and dense_deposit and samples == 1
             and n0 == width * height
             and width % T == 0 and height % T == 0)
    if tiled:
        def to_tiles(a):
            rest = a.shape[1:]
            return (a.reshape((height // T, T, width // T, T) + rest)
                    .transpose((0, 2, 1, 3) + tuple(
                        4 + i for i in range(len(rest))))
                    .reshape((n0,) + rest))
        rays = jax.tree.map(to_tiles, rays)

    if n0 % PACKET:
        pad = PACKET - n0 % PACKET
        rays = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), rays)

    # phase 0: assign camera rays their first (only) instance
    arena, fb = shuffle(scene, rays, fb)

    # phase 1: K = max_depth bounce GENERATIONS, statically unrolled.
    # Each generation is round g of trace_image restricted to the
    # surviving (bounced) lanes: closest-hit + shade + shadow spawn; the
    # RR block rewrites bounced lanes' origin/direction in place and the
    # next generation re-traces them. Lanes that miss retire (single
    # instance: the prev-exclusion makes re-entry impossible, exactly
    # shuffle's retirement). Generation K-1 runs with no_bounce=True —
    # ndepth > 0 is statically false there (depth counts down from
    # max_depth), so removing the RR transcendentals is exact.
    tile = _choose_tile(scene.num_triangles)
    spawns = []
    for g in range(max_depth):
        o_obj, d_obj, ray_mesh = to_object_space(scene, arena)
        queued = arena.active & (arena.inst >= 0) & (ray_mesh >= 0)
        if accel is not None:
            hit = _intersect_bvh(scene, accel, o_obj, d_obj, ray_mesh,
                                 queued)
        else:
            hit = intersect_closest(
                o_obj, d_obj, ray_mesh, queued,
                scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mesh,
                tile=tile)
        surf_hits = queued & (hit.prim >= 0)
        arena, fb, spawn_g = _process_surface_hits(
            scene, arena, fb, hit, surf_hits, jnp.int32(g),
            no_bounce=(g == max_depth - 1))
        spawns.append(spawn_g)
        if g < max_depth - 1:
            arena = arena.replace(
                active=arena.active & ~(queued & (hit.prim < 0)))
    spawn = (jnp.concatenate(spawns, axis=0) if len(spawns) > 1
             else spawns[0])

    # phase 2: occlusion-test the spawn matrix IN PLACE — its
    # (generation, light, lane) layout is already dense, so no free-lane
    # scatter is needed. Shadow rays live in the same (single) instance
    # they spawned in.
    m = spawn.shape[0]
    if m == 0:
        return image_lib.clamp_rgb(fb)
    s_valid = spawn[:, 15] > 0.5
    minv = scene.inst_minv[0]
    # broadcast-multiply + small-axis sum, NOT an "ij,nj->ni" einsum: the
    # unbatched form is a real matmul that XLA lowers onto the MXU with
    # bf16 operands, which shifted shadow origins enough to flip
    # occlusion on 13% of bunny pixels (max byte err 127) — the exact
    # failure mode the looped path's batched "nij,nj->ni" comment warns
    # about (to_object_space NOTE / .claude verify recipe)
    m3 = minv[:3, :3]
    s_o = jnp.sum(m3[None, :, :] * spawn[:, None, 0:3], axis=-1) \
        + minv[:3, 3]
    s_d = jnp.sum(m3[None, :, :] * spawn[:, None, 3:6], axis=-1)
    if m % PACKET:
        padm = PACKET - m % PACKET
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros((padm,) + a.shape[1:], a.dtype)])
        s_o, s_d, s_valid_p = z(s_o), z(s_d), z(s_valid)
    else:
        s_valid_p = s_valid
    mesh_ids = jnp.broadcast_to(scene.inst_mesh[0], (s_o.shape[0],))
    if accel is not None:
        hit2 = _intersect_bvh(
            scene, accel, s_o, s_d, mesh_ids, s_valid_p,
            is_shadow=jnp.ones_like(s_valid_p))
    else:
        hit2 = intersect_closest(
            s_o, s_d, mesh_ids, s_valid_p,
            scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mesh,
            tile=_choose_tile(scene.num_triangles))
    occluded = hit2.prim[:m] >= 0

    # retire: unoccluded shadow rays deposit color*w (TracerBase.h:396-399).
    # Deposits associate PER GENERATION ((fb + c_g0) + c_g1 + ...): the
    # looped tracer retires generation g's shadows in round g, so summing
    # all generations before the fb add would differ by float association
    # — per-generation adds keep depth>1 frames bit-equal. Within a
    # generation the dense (light, sample) sum matches the looped tracer's
    # same-round local_add (the depth-1 contract, unchanged).
    color = spawn[:, 6:9]
    deposit = (s_valid & ~occluded
               & (jnp.sum(color**2, axis=-1) > 0.0))
    m_gen = m // max_depth
    for g in range(max_depth):
        sl = slice(g * m_gen, (g + 1) * m_gen)
        spawn_g, deposit_g = spawn[sl], deposit[sl]
        if dense_deposit:
            # whole-film camera wavefront: the camera emits lanes in
            # ((j*W+i)*S+k)*S+s order, so pixel == lane // S^2 and spawn
            # row li*n + lane maps back by reshape — the deposit is a
            # DENSE per-(light, sample) add with no pixel-id scatter (a
            # 262K-row scatter costs ~15 ms/frame at 512^2 on v5e,
            # scripts/micro_stages.py). Pass `samples` for S>1 films;
            # dense_deposit=False keeps the general scatter (subwindow
            # crops, permuted wavefronts).
            fb = _dense_spawn_deposit(fb, spawn_g, deposit_g,
                                      arena.capacity, n0, samples, tiled,
                                      width, height, T)
        else:
            fb = image_lib.local_add(
                fb, spawn_g[:, 12].astype(jnp.int32),
                spawn_g[:, 6:9] * spawn_g[:, 11:12],
                jnp.ones((m_gen,), jnp.float32), deposit_g)
    return image_lib.clamp_rgb(fb)


def make_arena(camera_rays: RayArena, num_lights: int,
               slack: float = 1.25) -> RayArena:
    """Embed camera rays into an arena with room for shadow spawns.

    num_lights=0 (e.g. volume wavefronts, which never spawn) gets a tight
    arena: every per-round op scales with arena capacity, so slack lanes
    are pure marching cost — a 512^2 volume frame with the old
    always->=2x sizing spent 2.5x the gather traffic of the rays it owned.
    """
    n = camera_rays.capacity
    spawn_mult = (1 + num_lights) if num_lights > 0 else 1
    cap = int(n * spawn_mult * (slack if num_lights > 0 else 1.0))
    cap = -(-cap // 1024) * 1024
    arena = RayArena.zeros(cap)
    idx = jnp.arange(n)
    return jax.tree.map(lambda dst, src: dst.at[idx].set(src),
                        arena, camera_rays)
