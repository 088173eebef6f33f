"""Domain scheduler: scene domains sharded over devices, rays migrate.

The TPU re-design of Tracer<DomainScheduler> (algorithm/DomainTracer.h) and
the async DomainTracer: instances map to devices round-robin
(DomainTracer.h:115-144); each round a device traces only rays whose target
instance it owns, the shuffle assigns next instances, and rays bound for
remote domains are packed into fixed-capacity per-destination buffers and
exchanged with ONE `lax.all_to_all` over the ICI mesh axis — replacing the
reference's per-rank count-handshake + Isend/Irecv ray exchange
(DomainTracer.h:370-496). Termination is a `psum` of queued-ray counts
(replacing the MPI_Gather/Scatter check at :337-352 and the async 2PC vote,
vote.cpp:47-152 — in SPMD a collective reduction IS the vote).

Memory model: every device holds ONLY the triangle/BVH data of its own
domains (padded to a common size), which is the entire point of domain
scheduling — scenes larger than one chip's HBM.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gravit_tpu.accel.scene_accel import SceneBVH, build_scene_bvh
from gravit_tpu.core.rays import RayArena
from gravit_tpu.render import tracer as tracer_lib
from gravit_tpu.render.scene_build import Instance, SceneData, build_scene
from gravit_tpu.scene import image as image_lib
from gravit_tpu.scene.light import Light
from gravit_tpu.scene.mesh import CompiledMesh


def round_robin_owners(num_instances: int, n_dev: int) -> np.ndarray:
    """Instance -> device map; round-robin like the reference's Locations
    distribution (DomainTracer.h:115-144)."""
    return (np.arange(num_instances) % n_dev).astype(np.int32)


def one_hot_residency(owners: np.ndarray, n_dev: int) -> np.ndarray:
    res = np.zeros((owners.shape[0], n_dev), bool)
    res[np.arange(owners.shape[0]), owners] = True
    return res


def build_routes(resident: np.ndarray):
    """Routing tables from a (I, D) residency matrix.

    Returns (route, n_rep): `route[i]` lists domain i's resident devices
    cyclically padded to D entries; a ray with pixel id `p` bound for
    domain i is served by `route[i, p % n_rep[i]]` — static round-robin
    over replicas, the TPU analog of the TVCG'13 replication policies
    actually SERVING rays from a replica (LoadAnotherSchedule.h:49-90)
    rather than just holding a copy.
    """
    I, D = resident.shape
    route = np.zeros((I, D), np.int32)
    n_rep = np.ones((I,), np.int32)
    for i in range(I):
        devs = np.nonzero(resident[i])[0]
        if devs.size == 0:
            devs = np.array([0])
        n_rep[i] = devs.size
        route[i] = np.resize(devs, D)
    return route, n_rep


def partition_scene(meshes: Sequence[CompiledMesh],
                    instances: Sequence[Instance],
                    lights: Sequence[Light],
                    n_dev: int, owners: np.ndarray | None = None,
                    resident: np.ndarray | None = None):
    """Build per-device SceneData stacked on a leading device axis.

    Device d's triangle soup holds only the meshes its instances need
    (adapter-cache semantics: each rank loads what it owns). Instance
    tables (AABBs, transforms) are replicated — they are tiny and every
    device needs them for the shuffle. inst_mesh is LOCAL mesh ids, -1 for
    foreign instances (their rays are never traced locally).

    `resident` ((I, D) bool, multi-hot rows allowed) replicates a domain's
    mesh data onto EVERY device marked resident — the replication policies'
    data placement. When omitted it is the one-hot of `owners`.
    """
    if resident is None:
        if owners is None:
            owners = round_robin_owners(len(instances), n_dev)
        resident = one_hot_residency(np.asarray(owners), n_dev)
    owners = primary_owner_np(resident)

    # correct world bboxes need GLOBAL mesh bounds (a device's local mesh
    # list can't resolve foreign instances' meshes)
    ref_scene = build_scene(meshes, instances, lights)
    true_lo, true_hi = ref_scene.inst_lo, ref_scene.inst_hi

    per_dev = []
    for d in range(n_dev):
        local_mesh_ids = _local_mesh_ids(instances, resident, d)
        gl2loc = {g: l for l, g in enumerate(local_mesh_ids)}
        local_meshes = [meshes[g] for g in local_mesh_ids]
        # all instances, with local mesh ids (or -1 if not resident here)
        inst = [Instance(mesh_id=gl2loc.get(instances[i].mesh_id, 0),
                         m=instances[i].m) for i in range(len(instances))]
        sd = build_scene(local_meshes if local_meshes else [meshes[0]],
                         inst, lights)
        mask = resident[:, d].astype(np.int32)
        per_dev.append((sd, mask))

    # pad triangle-soup + vertex leaves to the max size across devices
    t_max = max(sd.num_triangles for sd, _ in per_dev)
    v_max = max(sd.vertices.shape[0] for sd, _ in per_dev)
    padded = []
    for d, (sd, mask) in enumerate(per_dev):
        if sd.num_triangles < t_max:
            sd = _pad_scene_tris(sd, t_max)
        if sd.vertices.shape[0] < v_max:
            vpad = v_max - sd.vertices.shape[0]
            sd = sd.replace(vertices=jnp.concatenate(
                [sd.vertices, jnp.zeros((vpad, 3), jnp.float32)]))
        # foreign instances get mesh id -1 so their rays never match local
        # triangles
        inst_mesh = jnp.where(jnp.asarray(mask) > 0, sd.inst_mesh, -1)
        # static fields must be identical across devices for tree.map
        # (incl. the instance tree: per-device builds saw local-mesh
        # bounds, which are wrong for foreign instances)
        sd = sd.replace(inst_mesh=inst_mesh, inst_lo=true_lo,
                        inst_hi=true_hi, inst_bvh=ref_scene.inst_bvh,
                        num_meshes=max(x.num_meshes for x, _ in per_dev),
                        mesh_tri_offset=(), mesh_tri_count=(),
                        has_embree_materials=any(
                            x.has_embree_materials for x, _ in per_dev),
                        has_specular=any(
                            x.has_specular for x, _ in per_dev))
        padded.append(sd)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
    return stacked, jnp.asarray(owners)


def _pad_scene_tris(sd: SceneData, t_max: int) -> SceneData:
    pad = t_max - sd.num_triangles
    padz = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return sd.replace(
        tri_v0=padz(sd.tri_v0), tri_e1=padz(sd.tri_e1),
        tri_e2=padz(sd.tri_e2), tri_ng=padz(sd.tri_ng),
        tri_ns=padz(sd.tri_ns), tri_vcol=padz(sd.tri_vcol),
        tri_has_vcol=jnp.concatenate(
            [sd.tri_has_vcol, jnp.zeros((pad,), bool)]),
        tri_mesh=jnp.concatenate(
            [sd.tri_mesh, jnp.full((pad,), -2, jnp.int32)]),
        tri_mat_type=padz(sd.tri_mat_type), tri_kd=padz(sd.tri_kd),
        tri_ks=padz(sd.tri_ks), tri_alpha=padz(sd.tri_alpha),
        tri_eta=padz(sd.tri_eta), tri_k=padz(sd.tri_k),
        tri_rough=padz(sd.tri_rough), tri_hsc=padz(sd.tri_hsc),
        tri_bs=padz(sd.tri_bs), tri_hsf=padz(sd.tri_hsf),
        faces=jnp.concatenate([sd.faces, jnp.zeros((pad, 3), jnp.int32)]),
    )


def _local_mesh_ids(instances, resident, d):
    return sorted({instances[i].mesh_id for i in range(len(instances))
                   if resident[i, d]})


def primary_owner_np(resident: np.ndarray) -> np.ndarray:
    return np.argmax(resident, axis=1).astype(np.int32)


def partition_accel(meshes: Sequence[CompiledMesh],
                    instances: Sequence[Instance],
                    n_dev: int, resident: np.ndarray) -> SceneBVH:
    """Per-device Pallas BVH accel, padded to common shapes and stacked on a
    leading device axis (mirror of partition_scene's triangle partitioning).

    The reference runs the SAME fast adapter under every scheduler
    (algorithm/DomainTracer.h:228-326 -> EmbreeMeshAdapter.cpp:625); this
    gives the domain scheduler the same property: each device owns the flat
    BVHs of only its local meshes. Padding mesh slots get root -1 (their
    ray blocks are skipped by the kernel)."""
    if resident.ndim == 1:  # legacy owners vector
        resident = one_hot_residency(np.asarray(resident), n_dev)
    per_dev = []
    for d in range(n_dev):
        ids = _local_mesh_ids(instances, resident, d)
        local = [meshes[g] for g in ids] if ids else [meshes[0]]
        per_dev.append(build_scene_bvh(local))

    nn = max(a.bounds.shape[0] for a in per_dev)
    tp = max(a.tri.shape[0] for a in per_dev)
    m_max = max(a.num_meshes for a in per_dev)

    def padded(a: SceneBVH) -> SceneBVH:
        padn = nn - a.bounds.shape[0]
        padt = tp - a.tri.shape[0]
        padm = m_max - a.mesh_root.shape[0]
        z = lambda arr, p: jnp.concatenate(
            [arr, jnp.zeros((p,) + arr.shape[1:], arr.dtype)]) if p else arr
        root = jnp.concatenate(
            [a.mesh_root, jnp.full((padm,), -1, jnp.int32)]
        ) if padm else a.mesh_root
        return SceneBVH(
            bounds=z(a.bounds, padn), meta=z(a.meta, padn),
            tri=z(a.tri, padt), leaf2global=z(a.leaf2global, padt),
            mesh_root=root, num_meshes=m_max)

    return jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[padded(a) for a in per_dev])


def _pack_exchange(arena: RayArena, dest: jax.Array, n_dev: int, cap: int):
    """Compact rays by destination device into a (n_dev, cap) lane buffer.

    dest: (C,) destination device per lane, -1 = stays local. Overflowing
    rays are DROPPED (counted in the returned scalar) — capacity should be
    sized so this never fires in practice.
    """
    c = arena.capacity
    send_mask = dest >= 0
    d_safe = jnp.where(send_mask, dest, 0)
    # rank within destination bucket via one-hot cumsum.
    # COST NOTE: this is O(C x n_dev) int work per round (the cumsum over
    # the full arena x device count). At 8 devices it is noise; at 64+
    # devices prefer ray_axis sharding (which divides C per device) or a
    # sort-based ranking — measured on v5e the one-hot form beats a sort
    # up to ~16 destinations (scripts/micro_tpu4.py: sorts are ~10x a
    # cumsum at arena width).
    onehot = jax.nn.one_hot(d_safe, n_dev, dtype=jnp.int32) * \
        send_mask[:, None].astype(jnp.int32)
    rank = jnp.cumsum(onehot, axis=0) - onehot  # exclusive prefix per dest
    my_rank = jnp.sum(rank * onehot, axis=1)
    # per-destination demand this round (for predictive capacity sizing)
    dest_demand = jnp.max(rank[-1] + onehot[-1])
    slot = jnp.where(send_mask & (my_rank < cap),
                     d_safe * cap + my_rank, n_dev * cap)
    dropped = jnp.sum((send_mask & (my_rank >= cap)).astype(jnp.int32))

    def pack(field):
        out_shape = (n_dev * cap,) + field.shape[1:]
        buf = jnp.zeros(out_shape, field.dtype)
        return buf.at[slot].set(field, mode="drop").reshape(
            (n_dev, cap) + field.shape[1:])

    packed = jax.tree.map(pack, arena)
    # mark validity: a packed lane is valid iff some ray landed there
    valid = jnp.zeros((n_dev * cap,), bool).at[slot].set(
        arena.active & send_mask, mode="drop").reshape(n_dev, cap)
    packed = packed.replace(active=valid)
    # sent rays leave the local arena
    arena = arena.replace(active=arena.active & ~send_mask)
    return arena, packed, dropped, dest_demand


def _merge_incoming(arena: RayArena, incoming: RayArena):
    """Scatter received rays into free local lanes (prefix allocation).

    Returns (arena, dropped): rays that arrive when no free lane exists are
    counted, not silently lost — trace_domain psums the count out so callers
    can auto-grow capacity (the reference exchange is lossless by
    construction, DomainTracer.h:370-496; here loudness + resize replaces
    dynamic buffers)."""
    c = arena.capacity
    flat = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[2:]), incoming)
    # k-th free lane from the BOTTOM via cumsum + one scatter (no sort —
    # same construction as tracer._append_rays, ascending order)
    inact = ~arena.active
    rank_bot = jnp.cumsum(inact.astype(jnp.int32)) - 1
    lane_of_rank = jnp.full((c,), c, jnp.int32).at[
        jnp.where(inact, rank_bot, c)].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")
    n_free = jnp.sum(inact.astype(jnp.int32))
    rank = jnp.cumsum(flat.active.astype(jnp.int32)) - 1
    overflow = flat.active & (rank >= n_free)
    dropped = jnp.sum(overflow.astype(jnp.int32))
    ok = flat.active & ~overflow
    slot = jnp.where(ok, lane_of_rank[jnp.clip(rank, 0, c - 1)], c)

    # inverse map + per-field GATHER instead of per-field row scatter
    # (row scatters are ~5x dearer than gathers on v5e, micro_tpu5.py)
    m = slot.shape[0]
    src_row = jnp.full((c,), m, jnp.int32).at[slot].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    written = src_row < m
    src_safe = jnp.clip(src_row, 0, m - 1)

    def put(dst, src):
        w = written.reshape((c,) + (1,) * (dst.ndim - 1))
        return jnp.where(w, src[src_safe], dst)

    return jax.tree.map(put, arena, flat), dropped


def _compact_arena(arena: RayArena, c_local: int):
    """Prefix-compact active lanes into a fresh c_local-lane arena.

    The post-claim WIDTH REDUCTION that makes per-device round work
    O(C/n): with the arena replicated (the pre-r5 design), every device
    paid full-C-width selects/pack/shuffle every round even though it
    claimed only ~1/n of the rays — scripts/profile_domain.py measured
    that as ~95% of SCALING_r04's wall-clock inflation (trace-only
    variant: 204 -> 1792 ms from 1 -> 8 virtual devices; the exchange
    phases were noise). Overflowing rays are dropped and counted
    (callers regrow local_slack, same loudness protocol as the
    exchange)."""
    c = arena.capacity
    act = arena.active
    rank = jnp.cumsum(act.astype(jnp.int32)) - 1
    overflow = act & (rank >= c_local)
    dropped = jnp.sum(overflow.astype(jnp.int32))
    slot = jnp.where(act & ~overflow, rank, c_local)
    src_row = jnp.full((c_local,), c, jnp.int32).at[slot].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")
    written = src_row < c
    src_safe = jnp.clip(src_row, 0, c - 1)

    def take(field):
        w = written.reshape((c_local,) + (1,) * (field.ndim - 1))
        return jnp.where(w, field[src_safe],
                         jnp.zeros_like(field[:c_local]))

    return jax.tree.map(take, arena), dropped


def trace_domain(scene_stacked: SceneData, owners: jax.Array,
                 arena: RayArena, width: int, height: int, mesh: Mesh,
                 axis: str = "domains", max_rounds: int = 32,
                 exchange_cap: int | None = None,
                 ray_axis: str | None = None,
                 accel: SceneBVH | None = None,
                 return_stats: bool = False,
                 resident: np.ndarray | None = None,
                 return_load: bool = False,
                 initial_shuffle: bool = True,
                 return_arena: bool = False,
                 local_slack: float = 2.0):
    """Run the domain-scheduled trace over the device mesh; returns fb.

    arena: the FULL camera wavefront, replicated (every device filters to
    its own domains, as the reference's FilterRaysLocally/shuffleDropRays).

    ray_axis: optional SECOND mesh axis for hybrid sharding — the arena is
    additionally split over it (each domain group serves a slice of the
    rays), composing the Domain (model-parallel) and Image (data-parallel)
    schedulers on a 2D mesh. Migration all_to_alls stay within the domain
    axis; the framebuffer psums over both.

    accel: optional device-stacked SceneBVH from partition_accel — the
    Pallas packet-BVH kernel then runs UNDER the domain scheduler exactly
    as the reference's fast adapter runs under every tracer
    (DomainTracer.h:228-326).

    return_stats: also return the psum'd count of rays dropped by exchange
    overflow (pack + merge). Nonzero means the image is missing energy —
    callers should grow exchange_cap / arena capacity (DomainRenderer.render
    does this automatically). Pass the string "peak" to instead get the
    tuple (drops, peak_dest_demand) where the second value is the largest
    single-destination send demand observed in any round — the predictive
    capacity a retry should use.

    resident: optional (I, n_dev) bool residency matrix (multi-hot rows =
    replicated domains). A ray bound for domain i is served by ANY device
    resident for i: it stays put if its current device is resident,
    otherwise it is routed round-robin by pixel id over i's replicas
    (build_routes) — the end-to-end realization of the TVCG'13 replication
    policies (LoadAnother/LoadMany/AdaptiveSend). Default: one-hot of
    `owners`.

    return_load: additionally return a (n_dev,) per-device count of
    ray-rounds traced (the measured queue histogram the hybrid policies
    feed on).

    initial_shuffle=False resumes a PARTIAL frame (in-frame hybrid remap,
    HybridTracer.h:223-299): `arena` is then the (n_dev*C_local,) stacked
    per-device state a previous return_arena=True call produced, sharded
    back onto the devices; no camera-ray claim runs. Rays whose domain
    moved since the pause simply park one round and migrate through the
    normal exchange. return_arena=True additionally returns (stacked
    arena, per-domain pending histogram) so the caller can decide whether
    to reshard before resuming.

    local_slack: each device's working arena is compacted after the
    initial claim to ~(C/n_dev) * local_slack lanes (capped at C), so
    per-round work scales as C/n instead of C (the SCALING_r04 fix;
    see _compact_arena). Rays that do not fit are counted in `drops` —
    DomainRenderer.render regrows the slack alongside the exchange cap.
    """
    n_dev = mesh.shape[axis]
    cap = exchange_cap or max(1024, arena.capacity // n_dev)
    if initial_shuffle:
        shard_in = arena.capacity // (mesh.shape[ray_axis] if ray_axis
                                      else 1)
        want = -(-int(shard_in * local_slack) // n_dev)
        c_local = min(shard_in, max(1024, -(-want // 1024) * 1024))
    else:
        c_local = arena.capacity // n_dev

    if resident is None:
        resident = one_hot_residency(np.asarray(owners), n_dev)
    route_np, n_rep_np = build_routes(np.asarray(resident))
    route = jnp.asarray(route_np)
    n_rep = jnp.asarray(n_rep_np)
    res = jnp.asarray(np.asarray(resident).astype(np.int32))

    fb, drops, load, arena_out_v, hist, peak = _trace_domain_jit(
        scene_stacked, route, n_rep, res, arena, accel,
        mesh=mesh, axis=axis, ray_axis=ray_axis, width=width, height=height,
        max_rounds=max_rounds, cap=cap, initial_shuffle=initial_shuffle,
        c_local=c_local)
    if not return_arena:
        fb = image_lib.clamp_rgb(fb)
    out = [fb]
    if return_stats:
        out.append((drops, peak) if return_stats == "peak" else drops)
    if return_load:
        out.append(load)
    if return_arena:
        out += [arena_out_v, hist]
    return tuple(out) if len(out) > 1 else fb


@functools.partial(jax.jit, static_argnames=(
    "mesh", "axis", "ray_axis", "width", "height", "max_rounds", "cap",
    "initial_shuffle", "c_local"))
def _trace_domain_jit(scene_stacked, route, n_rep, res, arena, accel,
                      *, mesh: Mesh, axis: str, ray_axis, width: int,
                      height: int, max_rounds: int, cap: int,
                      initial_shuffle: bool, c_local: int):
    """The compiled core of trace_domain — ONE jitted program per config.

    The shard_map closure must live under an outer jit keyed on the static
    config: re-creating it per call re-traces AND re-compiles every frame
    (measured 2.8 s/frame of pure overhead on CPU — the round-3 scaling
    artifact's "40x overhead" was exactly this, not collective cost)."""
    n_dev = mesh.shape[axis]

    scene_specs = jax.tree.map(lambda _: P(axis), scene_stacked)
    arena_in = P(axis) if not initial_shuffle else (
        P(ray_axis) if ray_axis else P())
    arena_specs = jax.tree.map(lambda _: arena_in, arena)
    accel_specs = jax.tree.map(lambda _: P(axis), accel)
    arena_out = jax.tree.map(lambda _: P(axis), arena)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(scene_specs, P(), P(), P(), arena_specs, accel_specs),
        out_specs=(P(), P(), P(), arena_out, P(), P()),
        check_vma=False)
    def run(scene_d, route, n_rep, res, arena, accel_d):
        unstack = lambda a: a[0] if a.ndim and a.shape[0] == 1 else a
        scene_l = jax.tree.map(unstack, scene_d)
        accel_l = jax.tree.map(unstack, accel_d)
        me = jax.lax.axis_index(axis)
        tile = tracer_lib._choose_tile(scene_l.tri_v0.shape[0])
        fb = image_lib.new_framebuffer(width, height)
        n_inst = route.shape[0]

        def serving_device(inst, ray_id):
            """Replica that serves (domain, ray): round-robin by pixel id."""
            i = jnp.clip(inst, 0, n_inst - 1)
            return route[i, ray_id % n_rep[i]]

        if initial_shuffle:
            # initial filter: assign first instances, keep rays THIS device
            # serves (shuffleDropRays, DomainTracer.h:148-183; replicas
            # split a hot domain's primary wavefront between them), then
            # COMPACT to the local working width so every subsequent round
            # costs O(C/n) per device, not O(C) (_compact_arena)
            arena, fb = tracer_lib.shuffle(scene_l, arena, fb)
            claim = serving_device(arena.inst, arena.id) == me
            arena = arena.replace(
                active=arena.active & ((arena.inst < 0) | claim))
            arena, d_claim = _compact_arena(arena, c_local)
        else:
            # the P(axis) in_spec already delivered this device's
            # (c_local, ...) shard of the stacked arena — resume as-is
            d_claim = jnp.int32(0)

        def round_fn(state):
            r, arena, fb, drops, traced, peak = state
            # load metric: rays actually traceable here this round (parked
            # foreign rays awaiting migration are not local work)
            here0 = res[jnp.clip(arena.inst, 0, n_inst - 1), me] > 0
            traced = traced + jnp.sum(
                (arena.active & (arena.inst >= 0) & here0)
                .astype(jnp.int32))
            # trace_round only processes rays whose instance has local mesh
            # data (inst_mesh == -1 for foreign instances parks the lane)
            arena, fb2 = tracer_lib.trace_round(scene_l, arena, fb, r, tile,
                                                accel=accel_l)
            # exchange: a ray migrates only if NO local replica serves its
            # target domain; its destination replica is picked by pixel id
            here = res[jnp.clip(arena.inst, 0, n_inst - 1), me] > 0
            send = arena.active & (arena.inst >= 0) & ~here
            # skip the whole pack/all_to_all/merge when NO device has a
            # migrant this round (late rounds are mostly shadow-only; the
            # 1-int psum predicate is uniform across the axis group, so
            # every device takes the same cond branch and the collective
            # stays matched)
            n_send = jax.lax.psum(jnp.sum(send.astype(jnp.int32)), axis)

            def do_exchange(arena):
                dest = jnp.where(
                    send, serving_device(arena.inst, arena.id), -1)
                arena, packed, d_pack, demand = _pack_exchange(
                    arena, dest, n_dev, cap)
                incoming = jax.tree.map(
                    lambda a: jax.lax.all_to_all(
                        a, axis, split_axis=0, concat_axis=0, tiled=False),
                    packed)
                arena, d_merge = _merge_incoming(arena, incoming)
                return arena, d_pack + d_merge, demand

            arena, d_x, demand = jax.lax.cond(
                n_send > 0, do_exchange,
                lambda a: (a, jnp.int32(0), jnp.int32(0)), arena)
            return (r + 1, arena, fb2, drops + d_x, traced,
                    jnp.maximum(peak, demand))

        def cond(state):
            r, arena, fb, drops, traced, peak = state
            live = jnp.sum((arena.active & (arena.inst >= 0))
                           .astype(jnp.int32))
            live = jax.lax.psum(live, axis)
            if ray_axis:
                live = jax.lax.psum(live, ray_axis)
            return (r < max_rounds) & (live > 0)

        _, arena, fb, drops, traced, peak = jax.lax.while_loop(
            cond, round_fn,
            (jnp.int32(0), arena, fb, d_claim, jnp.int32(0),
             jnp.int32(0)))
        fb = jax.lax.psum(fb, axis)
        drops = jax.lax.psum(drops, axis)
        peak = jax.lax.pmax(peak, axis)
        load = jax.lax.all_gather(traced, axis)  # per-device histogram
        # per-domain pending histogram (the gathered (domain, #rays) map
        # the hybrid remap consumes, HybridTracer.h:223-265)
        live_mask = (arena.active & (arena.inst >= 0)).astype(jnp.int32)
        hist = jnp.zeros((n_inst,), jnp.int32).at[
            jnp.clip(arena.inst, 0, n_inst - 1)].add(live_mask, mode="drop")
        hist = jax.lax.psum(hist, axis)
        if ray_axis:
            fb = jax.lax.psum(fb, ray_axis)
            drops = jax.lax.psum(drops, ray_axis)
            load = jax.lax.psum(load, ray_axis)
            hist = jax.lax.psum(hist, ray_axis)
            peak = jax.lax.pmax(peak, ray_axis)
        return fb, drops, load, arena, hist, peak

    return run(scene_stacked, route, n_rep, res, arena, accel)


@dataclasses.dataclass
class DomainRenderer:
    """Convenience wrapper bundling partitioned scene + device mesh."""

    scene_stacked: SceneData
    owners: jax.Array
    mesh: Mesh
    axis: str = "domains"

    meshes_src: Sequence = None
    instances_src: Sequence = None
    lights_src: Sequence = None
    accel: SceneBVH | None = None
    resident: np.ndarray | None = None  # (I, n_dev) bool, multi-hot ok

    @classmethod
    def build(cls, meshes, instances, lights, mesh: Mesh,
              axis: str = "domains", owners: np.ndarray | None = None,
              use_accel: bool = False,
              resident: np.ndarray | None = None):
        n_dev = mesh.shape[axis]
        if resident is None:
            if owners is None:
                owners = round_robin_owners(len(instances), n_dev)
            resident = one_hot_residency(np.asarray(owners), n_dev)
        stacked, owners = partition_scene(meshes, instances, lights, n_dev,
                                          resident=resident)
        accel = (partition_accel(meshes, instances, n_dev, resident)
                 if use_accel else None)
        return cls(stacked, owners, mesh, axis, meshes, instances, lights,
                   accel, resident)

    def reschedule(self, pending: np.ndarray, policy: str = "RayWeightedSpread"):
        """Hybrid scheduling: recompute domain->device RESIDENCY from
        per-domain pending-ray counts using a schedule/policies.py policy,
        then repartition (the HybridTracer remap, HybridTracer.h:223-299,
        applied between frames). Multi-hot rows from the replication
        policies (LoadAnother/LoadMany/AdaptiveSend) are kept as-is: every
        resident device holds the domain's data and serves a round-robin
        share of its rays (trace_domain's replica routing)."""
        from gravit_tpu.schedule.policies import POLICIES

        n_dev = self.mesh.shape[self.axis]
        resident = POLICIES[policy](np.asarray(pending),
                                    np.asarray(self.owners), n_dev)
        stacked, owners = partition_scene(
            self.meshes_src, self.instances_src, self.lights_src, n_dev,
            resident=resident)
        accel = (partition_accel(self.meshes_src, self.instances_src, n_dev,
                                 resident)
                 if self.accel is not None else None)
        return DomainRenderer(stacked, owners, self.mesh, self.axis,
                              self.meshes_src, self.instances_src,
                              self.lights_src, accel, resident)

    def pending_histogram(self, camera) -> np.ndarray:
        """Per-domain primary-ray demand (the gathered (domain, #rays)
        map the hybrid policies consume)."""
        import jax.numpy as jnp

        from gravit_tpu.render.scene_build import build_scene
        from gravit_tpu.scene import image as image_lib

        scene = build_scene(self.meshes_src, self.instances_src,
                            self.lights_src)
        rays = camera.generate_rays()
        arena = tracer_lib.make_arena(rays, int(scene.num_lights))
        fb = image_lib.new_framebuffer(camera.film_width, camera.film_height)
        arena, _ = tracer_lib.shuffle(scene, arena, fb)
        inst = np.asarray(arena.inst)
        act = np.asarray(arena.active)
        n_inst = int(scene.num_instances)
        return np.bincount(inst[act & (inst >= 0)], minlength=n_inst)

    def repartition(self, resident: np.ndarray) -> "DomainRenderer":
        """Re-place domain data per a new residency matrix (same mesh)."""
        n_dev = self.mesh.shape[self.axis]
        stacked, owners = partition_scene(
            self.meshes_src, self.instances_src, self.lights_src, n_dev,
            resident=resident)
        accel = (partition_accel(self.meshes_src, self.instances_src, n_dev,
                                 resident)
                 if self.accel is not None else None)
        return DomainRenderer(stacked, owners, self.mesh, self.axis,
                              self.meshes_src, self.instances_src,
                              self.lights_src, accel, resident)

    def render_hybrid(self, camera, chunk: int = 4, tau: float = 2.0,
                      policy: str = "RayWeightedSpread",
                      max_rounds: int = 32, return_load: bool = False,
                      exchange_cap: int | None = None):
        """IN-FRAME hybrid scheduling (HybridTracer.h:223-299): trace in
        chunks of `chunk` rounds; after each chunk psum the per-domain
        pending histogram, and when the per-device load imbalance exceeds
        `tau` (max/mean over devices with work), re-place domains with
        `policy` and resume the SAME frame. Rays ride along in the stacked
        arena; ones whose domain moved migrate through the normal exchange
        on the next round. Host-stepped outer loop: each chunk is one
        compiled program, the remap decision is host-side — the TPU analog
        of the reference's per-iteration master remap."""
        import jax.numpy as jnp

        from gravit_tpu.schedule.policies import POLICIES

        rays = camera.generate_rays()
        arena = tracer_lib.make_arena(rays,
                                      int(self.scene_stacked.num_lights))
        n_dev = self.mesh.shape[self.axis]
        cap = exchange_cap or max(1024, arena.capacity // n_dev)
        dr = self
        if dr.resident is None:
            dr = dataclasses.replace(dr, resident=one_hot_residency(
                np.asarray(dr.owners), n_dev))
        fb_total = image_lib.new_framebuffer(camera.film_width,
                                             camera.film_height)
        loads = np.zeros((n_dev,), np.int64)

        def maybe_reshard(dr, hist):
            """Re-place domains when projected device load is imbalanced
            (imbalance over ALL devices: idle devices are the signal)."""
            route_np, n_rep_np = build_routes(np.asarray(dr.resident))
            dev_pending = np.zeros(n_dev)
            for i in np.nonzero(hist)[0]:
                dev_pending[route_np[i, :n_rep_np[i]]] += (
                    hist[i] / n_rep_np[i])
            if dev_pending.max() > 0 and (
                    dev_pending.max() / dev_pending.mean() > tau):
                resident = POLICIES[policy](
                    hist, primary_owner_np(np.asarray(dr.resident)), n_dev)
                if not np.array_equal(resident, dr.resident):
                    return dr.repartition(resident)
            return dr

        # iteration-0 remap: the reference recomputes the map BEFORE the
        # first trace too (HybridTracer.h:223 runs at every iteration),
        # so a bad initial placement never pays even one hot round
        dr = maybe_reshard(dr, np.asarray(dr.pending_histogram(camera),
                                          np.int64))

        first = True
        done_rounds = 0
        grows = 0
        max_grows = 3
        slack = 2.0
        while done_rounds < max_rounds:
            # keep the pre-chunk arena: a chunk is a pure function of
            # (arena, cap), so an overflowing chunk can be re-run exactly
            # from this state with a larger exchange capacity
            arena_prev = arena
            fb, (drops, peak), load, arena, hist = trace_domain(
                dr.scene_stacked, dr.owners, arena,
                camera.film_width, camera.film_height,
                dr.mesh, dr.axis, min(chunk, max_rounds - done_rounds),
                exchange_cap=cap, accel=dr.accel,
                return_stats="peak", return_load=True,
                resident=dr.resident, initial_shuffle=first,
                return_arena=True, local_slack=slack)
            if int(drops) > 0:
                # in-frame predictive regrow (same policy as render()):
                # a transient hot spot must not abort a long frame —
                # rewind to the pre-chunk state and replay the chunk with
                # capacity = the observed peak per-destination demand
                # (and doubled local width, in case the drop was
                # compaction overflow on the first chunk)
                if grows >= max_grows:
                    raise RuntimeError(
                        f"in-frame exchange still dropping {int(drops)} "
                        f"rays at cap={cap}; increase arena capacity")
                grows += 1
                need = -(-max(int(peak), cap + 1) // 1024) * 1024
                cap = min(max(need, cap * 2), arena_prev.capacity)
                slack = min(slack * 2.0, float(n_dev))
                arena = arena_prev
                continue
            fb_total = fb_total + fb
            loads += np.asarray(load, np.int64)
            done_rounds += chunk
            first = False
            hist = np.asarray(hist)
            if hist.sum() == 0:
                break
            dr = maybe_reshard(dr, hist)
        fb_total = image_lib.clamp_rgb(fb_total)
        return (fb_total, jnp.asarray(loads)) if return_load else fb_total

    def render(self, camera, max_rounds: int = 32, max_grows: int = 3,
               return_load: bool = False):
        """Render a frame; on exchange overflow, retry with doubled
        exchange capacity (auto-grow) so silent ray loss cannot produce a
        quietly wrong image. Raises if drops persist after max_grows."""
        rays = camera.generate_rays()
        arena = tracer_lib.make_arena(rays, int(self.scene_stacked.num_lights))
        n_dev = self.mesh.shape[self.axis]
        cap = max(1024, arena.capacity // n_dev)
        slack = 2.0
        for _ in range(max_grows + 1):
            fb, (drops, peak), load = trace_domain(
                self.scene_stacked, self.owners, arena,
                camera.film_width, camera.film_height,
                self.mesh, self.axis, max_rounds,
                exchange_cap=cap, accel=self.accel, return_stats="peak",
                resident=self.resident, return_load=True,
                local_slack=slack)
            if int(drops) == 0:
                return (fb, load) if return_load else fb
            # predictive regrow: jump straight to the observed peak
            # per-destination demand (one retry) instead of blind doubling
            # that can re-pay full-frame cost up to max_grows times.
            # Drops may also be local-arena compaction overflow (a hot
            # domain owner claiming more than C*slack/n rays) — grow the
            # slack in the same retry; at slack >= n_dev the local width
            # saturates at C (the pre-r5 replicated behavior, lossless).
            need = -(-max(int(peak), cap + 1) // 1024) * 1024
            cap = min(max(need, cap * 2), arena.capacity)
            slack = min(slack * 2.0, float(n_dev))
        raise RuntimeError(
            f"ray exchange still dropping {int(drops)} rays at "
            f"exchange_cap={cap}; increase arena capacity")
