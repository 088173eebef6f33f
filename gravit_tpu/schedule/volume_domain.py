"""Domain-scheduled VOLUME rendering: bricks sharded, rays migrate with
their accumulated color/opacity.

The gvtVol_parallel.py configuration (BASELINE.json config #5): volume
bricks distribute over ranks, rays march front-to-back through whichever
brick they're in and carry (rgb, opacity) across the wire, so depth order
is automatic — the reference needs IceT BLEND only to merge *finished*
pixels, which here is the final psum (rays retire on exactly one device).
Brick-to-device placement is round-robin (reference Locations semantics);
migration reuses the surface domain scheduler's packed all_to_all.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gravit_tpu.core.rays import RayArena
from gravit_tpu.render import volume_tracer
from gravit_tpu.render.volume_scene import (VolumeSceneData,
                                            build_volume_scene)
from gravit_tpu.schedule.domain_sched import (_merge_incoming,
                                              _pack_exchange,
                                              round_robin_owners)
from gravit_tpu.scene import image as image_lib
from gravit_tpu.scene.volume import Volume


def partition_volume_scene(volumes: Sequence[Volume],
                           instances: Sequence[Tuple[int, np.ndarray]],
                           n_dev: int,
                           owners: np.ndarray | None = None):
    """Per-device VolumeSceneData stacked on a leading axis.

    Requires all bricks to share one sample-grid shape (the VolApp brick
    reader produces near-uniform bricks; pad upstream otherwise). Each
    device keeps only its local bricks (padded to a common count);
    foreign instances get inst_vol = -1.
    """
    if owners is None:
        owners = round_robin_owners(len(instances), n_dev)

    shapes = {v.samples.shape for v in volumes}
    assert len(shapes) == 1, f"bricks must share a shape, got {shapes}"

    ref = build_volume_scene(volumes, instances)  # global tables

    # local volume lists
    per_dev = []
    max_local = 1
    for d in range(n_dev):
        local_vids = sorted({instances[i][0]
                             for i in range(len(instances))
                             if owners[i] == d})
        max_local = max(max_local, len(local_vids))
        per_dev.append(local_vids)

    stacked_scenes = []
    for d in range(n_dev):
        vids = per_dev[d]
        pad_count = max_local - len(vids)
        use = vids + [0] * pad_count if vids else [0] * max_local
        local_vols = [volumes[g] for g in use]
        g2l = {g: l for l, g in enumerate(vids)}
        inst_local = [(g2l.get(vid, 0), m) for vid, m in instances]
        sd = build_volume_scene(local_vols, inst_local)
        inst_vol = np.array(
            [g2l.get(instances[i][0], -1) if owners[i] == d else -1
             for i in range(len(instances))], np.int32)
        # static fields must match across devices for tree.map. The slice
        # engine needs only SPACING static (it sizes the plane ladder);
        # origin/TF-range ride traced through vol_origin/vol_vrange. Keep
        # a spacing-only vol_meta when spacing is uniform across bricks
        # (the VolApp brick reader's case), else disable the slice path.
        spacings = {tuple(float(x) for x in v.spacing) for v in volumes}
        common = (((0.0, 0.0, 0.0), next(iter(spacings)), (0.0, 0.0)),
                  ) * max_local if len(spacings) == 1 else ()
        sd = sd.replace(
            inst_vol=jnp.asarray(inst_vol),
            inst_lo=ref.inst_lo, inst_hi=ref.inst_hi,
            vol_step=tuple(ref.vol_step[0] for _ in range(max_local)),
            vol_max_steps=tuple(max(ref.vol_max_steps)
                                for _ in range(max_local)),
            vol_meta=common,
        )
        stacked_scenes.append(sd)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked_scenes)
    return stacked, jnp.asarray(owners)


def trace_volume_domain(scene_stacked: VolumeSceneData, owners: jax.Array,
                        arena: RayArena, width: int, height: int,
                        mesh: Mesh, axis: str = "domains",
                        max_rounds: int = 32,
                        exchange_cap: int | None = None,
                        return_stats: bool = False,
                        slice_axes: tuple = (),
                        slice_interpret: bool = False,
                        local_slack: float = 2.0):
    """slice_axes (static, per local-volume slot): marches qualifying
    bricks through the slice-order MXU engine INSIDE the sharded domain
    program — per-device brick origins/TF ranges ride traced
    (ops/slice_march.py), so one SPMD trace serves every device. Compute
    it with volume_tracer.slice_axes_for(scene_stacked, directions).

    local_slack: after the initial owner claim each device compacts its
    replicated arena to ~(C/n_dev)*local_slack lanes, so per-round march/
    shuffle work scales as C/n instead of C (the SCALING_r04 fix shared
    with the surface domain scheduler — see domain_sched._compact_arena).
    Compaction overflow is counted in the returned drops."""
    n_dev = mesh.shape[axis]
    cap = exchange_cap or max(1024, arena.capacity // n_dev)
    want = -(-int(arena.capacity * local_slack) // n_dev)
    c_local = min(arena.capacity, max(1024, -(-want // 1024) * 1024))

    fb, drops = _trace_volume_domain_jit(
        scene_stacked, owners, arena, mesh=mesh, axis=axis,
        width=width, height=height, max_rounds=max_rounds, cap=cap,
        slice_axes=slice_axes, slice_interpret=slice_interpret,
        c_local=c_local)
    fb = image_lib.clamp_rgb(fb)
    if return_stats:
        return fb, drops
    return fb


@functools.partial(jax.jit, static_argnames=(
    "mesh", "axis", "width", "height", "max_rounds", "cap", "slice_axes",
    "slice_interpret", "c_local"))
def _trace_volume_domain_jit(scene_stacked, owners, arena, *, mesh: Mesh,
                             axis: str, width: int, height: int,
                             max_rounds: int, cap: int, slice_axes: tuple,
                             slice_interpret: bool, c_local: int):
    """Compiled core — ONE jitted program per static config. The
    shard_map closure must live under an outer jit keyed on the config or
    every frame re-traces AND re-compiles (the round-3 '40x scaling
    overhead'; domain_sched._trace_domain_jit got this fix in round 4,
    this path gets it now)."""
    from gravit_tpu.schedule.domain_sched import _compact_arena

    n_dev = mesh.shape[axis]
    scene_specs = jax.tree.map(lambda _: P(axis), scene_stacked)
    arena_specs = jax.tree.map(lambda _: P(), arena)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(scene_specs, P(), arena_specs), out_specs=(P(), P()),
        check_vma=False)
    def run(scene_d, owners, arena):
        scene_l = jax.tree.map(
            lambda a: a[0] if a.ndim and a.shape[0] == 1 else a, scene_d)
        me = jax.lax.axis_index(axis)
        fb = image_lib.new_framebuffer(width, height)

        # initial generic filter, keep only locally-owned targets, then
        # compact to the local working width (per-round work O(C/n))
        arena = volume_tracer.filter_initial(scene_l, arena)
        inst_owner = owners[jnp.clip(arena.inst, 0, owners.shape[0] - 1)]
        arena = arena.replace(
            active=arena.active & ((arena.inst < 0) | (inst_owner == me)))
        arena, d_claim = _compact_arena(arena, c_local)

        def round_fn(state):
            r, arena, fb, drops = state
            arena = volume_tracer.march_round(
                scene_l, arena, slice_axes=slice_axes,
                slice_interpret=slice_interpret)
            arena, fb = volume_tracer.shuffle_volume(scene_l, arena, fb)
            inst_owner = owners[jnp.clip(arena.inst, 0,
                                         owners.shape[0] - 1)]
            send = arena.active & (arena.inst >= 0) & (inst_owner != me)
            # skip pack/all_to_all/merge when no device has a migrant
            # (uniform psum predicate keeps the collective matched)
            n_send = jax.lax.psum(jnp.sum(send.astype(jnp.int32)), axis)

            def do_exchange(arena):
                dest = jnp.where(send, inst_owner, -1)
                arena, packed, d_pack, _ = _pack_exchange(
                    arena, dest, n_dev, cap)
                incoming = jax.tree.map(
                    lambda a: jax.lax.all_to_all(
                        a, axis, split_axis=0, concat_axis=0, tiled=False),
                    packed)
                arena, d_merge = _merge_incoming(arena, incoming)
                return arena, d_pack + d_merge

            arena, d_x = jax.lax.cond(
                n_send > 0, do_exchange,
                lambda a: (a, jnp.int32(0)), arena)
            return r + 1, arena, fb, drops + d_x

        def cond(state):
            r, arena, fb, drops = state
            live = jnp.sum((arena.active & (arena.inst >= 0))
                           .astype(jnp.int32))
            return (r < max_rounds) & (jax.lax.psum(live, axis) > 0)

        _, arena, fb, drops = jax.lax.while_loop(
            cond, round_fn, (jnp.int32(0), arena, fb, d_claim))
        return jax.lax.psum(fb, axis), jax.lax.psum(drops, axis)

    return run(scene_stacked, owners, arena)
