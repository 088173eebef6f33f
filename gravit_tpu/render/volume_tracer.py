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
                differentiable: bool = False, slice_axes: tuple = (),
                slice_interpret: bool = False):
    """Phase 1: march all queued rays through their bricks (per-volume
    passes, statically unrolled; rays of other volumes are masked).

    Rays whose instance has no LOCAL brick data (inst_vol == -1 under the
    domain scheduler) park untouched until the all_to_all migrates them.

    slice_axes: optional static per-volume tuple of (axis, flip) | None.
    A volume with an entry marches through the slice-order MXU engine
    (ops/slice_march.py) instead of the gather march — the same engine-
    under-every-tracer property the reference's fast adapter has
    (EmbreeMeshAdapter under each scheduler). Entries must be None for
    AMR/iso/slice volumes (slice_axes_for computes this).
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
        use_slice = (not differentiable and v < len(slice_axes)
                     and slice_axes[v] is not None
                     and v < len(scene.vol_meta))
        if use_slice:
            from gravit_tpu.ops.slice_march import slice_march

            axis, flip = slice_axes[v]
            spacing = scene.vol_meta[v][1]     # static (sizes the ladder)
            isovals = (tuple(float(x) for x in scene.vol_isovalues[v])
                       if v < len(scene.vol_isovalues) else ())
            subs = (scene.vol_subgrids[v]
                    if v < len(scene.vol_subgrids) else ())
            slcs = (tuple(tuple(float(x) for x in pl)
                          for pl in scene.vol_slices[v])
                    if v < len(scene.vol_slices) else ())
            # origin and TF range ride TRACED (per-device bricks differ
            # under the sharded domain scheduler; one SPMD trace)
            c2, w2, flags = slice_march(
                o_obj, d_obj, mask, color, w,
                scene.vol_samples[v], scene.vol_color_lut[v],
                scene.vol_opacity_lut[v],
                axis=int(axis), flip=bool(flip),
                step=float(scene.vol_step[v]),
                base_step=float(min(spacing)),
                low=scene.vol_vrange[v][0], high=scene.vol_vrange[v][1],
                origin=scene.vol_origin[v], spacing=tuple(spacing),
                interpret=slice_interpret, isovalues=isovals,
                subgrids=subs, slices=slcs)
        else:
            c2, w2, flags = march_brick(
                o_obj, d_obj, mask, color, w,
                scene.vol_samples[v], scene.vol_origin[v],
                scene.vol_spacing[v],
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


def _slice_gate(minv_list, directions) -> tuple:
    """Object-space slice-path gate shared by can_slice_march /
    slice_axes_for. slice_march marches OBJECT-space rays
    (d_obj = inst_minv @ d), so the dominant-axis / conditioning checks
    must run on d_obj: a rotated instance transform can drive the
    object-space |d_axis| to ~0 while the world-space check passes
    (round-4 advisor finding), making safe_inv blow up and the brick
    render empty. Requires, for EVERY instance in minv_list:
      - one common (axis, flip) chosen from the object-space mean,
      - |d_obj_axis| >= MIN_AXIS_COMPONENT on the normalized direction
        (plane parametrization well-conditioned),
      - all d_obj[:, axis] sharing one sign consistent with the flip —
        a ray opposing the flip would march the fixed ascending plane
        ladder back-to-front and composite in the wrong order.
    Returns (ok, axis, flip)."""
    import numpy as np

    from gravit_tpu.ops.slice_march import (MIN_AXIS_COMPONENT,
                                            choose_slice_axis)

    d = np.asarray(directions, np.float64)
    axis, flip = 0, False
    for j, minv in enumerate(minv_list):
        m3 = np.asarray(minv, np.float64)[:3, :3]
        d_obj = d @ m3.T
        dn = d_obj / np.maximum(
            np.linalg.norm(d_obj, axis=-1, keepdims=True), 1e-30)
        a, f = choose_slice_axis(dn.mean(axis=0))
        if j == 0:
            axis, flip = a, f
        elif (a, f) != (axis, flip):
            return False, axis, flip
        da = dn[:, axis]
        if np.abs(da).min() < MIN_AXIS_COMPONENT:
            return False, axis, flip
        if (da.max() > 0.0) if flip else (da.min() < 0.0):
            return False, axis, flip
    return True, axis, flip


def can_slice_march(scene: VolumeSceneData, directions) -> tuple:
    """(ok, axis, flip): whether the slice-march fast path applies.

    Requires one volume in one instance, no AMR/iso/slice features (those
    keep the gather march), and every OBJECT-space ray within the
    dominant-axis cone with one consistent sign (see _slice_gate).
    `directions` is a host-side (N, 3) array of world directions.
    """
    if scene.num_volumes != 1 or scene.num_instances != 1:
        return False, 0, False
    if scene.vol_subgrids and scene.vol_subgrids[0] \
            and not _features_on_slice_ok(scene, 0):
        return False, 0, False
    if scene.vol_isovalues and scene.vol_isovalues[0] \
            and not _features_on_slice_ok(scene, 0):
        return False, 0, False
    if scene.vol_slices and scene.vol_slices[0] \
            and not _features_on_slice_ok(scene, 0):
        return False, 0, False
    if not scene.vol_meta:
        return False, 0, False
    return _slice_gate([scene.inst_minv[0]], directions)


def _features_on_slice_ok(scene: VolumeSceneData, v: int) -> bool:
    """Isosurfaces and AMR subgrids run on the slice engine only for
    VMEM-resident configurations: the main brick PLUS any subgrids must
    fit the slab budget in one dispatch (the kernel's gradient taps and
    sub overrides need the whole z-range resident); bigger bricks keep
    the gather march."""
    from gravit_tpu.ops.slice_march import SLAB_BYTES

    nz, ny, nx = scene.vol_samples[v].shape[-3:]   # [-3:]: stacked scenes
    total = nz * ny * nx * 4
    if v < len(scene.vol_subgrids):
        for sub in scene.vol_subgrids[v]:
            sz, sy, sx = sub[0].shape[-3:]
            total += sz * sy * sx * 4
    return total <= SLAB_BYTES


def trace_volume_fast(scene: VolumeSceneData, rays: RayArena, width: int,
                      height: int, axis: int | None = None,
                      flip: bool | None = None,
                      interpret: bool | None = None,
                      use_reference: bool = False) -> jax.Array:
    """Single-brick volume megapass: the whole frame in ONE slice-march
    kernel dispatch (ops/slice_march.py) — the fast volume engine, the
    role ospTraceRays/GregSpray plays for the reference
    (OSPRayAdapter.cpp:301).

    Exactly the single-volume single-instance whole-film case (the
    BenchOspray config): every camera ray marches one brick and retires —
    under those conditions the wavefront loop is statically known to run
    filter -> march -> deposit, so the round machinery (arena, shuffle,
    flag protocol) drops out entirely. Callers gate on
    `num_volumes == num_instances == 1` and no AMR/iso/slice features
    (those paths keep the gather march) and fall back to trace_volume.

    `rays` is the raw camera wavefront (make_arena not needed). axis/flip
    override the dominant-axis choice (computed from the mean ray
    direction otherwise — one small host transfer; pass them explicitly
    in frame loops). use_reference runs the jnp twin (differentiable).
    """
    import numpy as np

    from gravit_tpu.ops import slice_march as sm

    assert scene.num_volumes == 1 and scene.num_instances == 1
    if (scene.vol_isovalues and scene.vol_isovalues[0]) or \
            (scene.vol_subgrids and scene.vol_subgrids[0]) or \
            (scene.vol_slices and scene.vol_slices[0]):
        assert _features_on_slice_ok(scene, 0)  # oversize -> march
    if interpret is None:
        import os
        interpret = (os.environ.get("GRAVIT_PALLAS_INTERPRET", "0") == "1"
                     or jax.default_backend() not in ("tpu", "axon"))

    if axis is None or flip is None:
        # axis/flip come from the OBJECT-space mean (the frame slice_march
        # actually marches in) — see _slice_gate
        m3 = np.asarray(scene.inst_minv[0], np.float64)[:3, :3]
        d_mean = (np.asarray(rays.direction, np.float64) @ m3.T).mean(axis=0)
        axis, flip = sm.choose_slice_axis(d_mean)

    origin, spacing, (low, high) = scene.vol_meta[0]
    step = float(scene.vol_step[0])
    base = float(min(spacing))
    isovals = (tuple(float(x) for x in scene.vol_isovalues[0])
               if scene.vol_isovalues else ())
    slcs = (tuple(tuple(float(x) for x in pl)
                  for pl in scene.vol_slices[0])
            if scene.vol_slices else ())
    meta = dict(axis=int(axis), flip=bool(flip), step=step, base_step=base,
                low=low, high=high, origin=tuple(origin),
                spacing=tuple(spacing), isovalues=isovals, slices=slcs)

    n0 = rays.capacity
    R = sm.RAYS_PER_BLOCK
    pad = (-n0) % R
    if pad:
        rays = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), rays)

    return _trace_volume_fast_jit(
        scene, rays, width, height, n0,
        interpret=bool(interpret), use_reference=bool(use_reference),
        **meta)


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "n0", "interpret", "use_reference", "axis", "flip",
    "step", "base_step", "low", "high", "origin", "spacing", "isovalues",
    "slices"))
def _trace_volume_fast_jit(scene: VolumeSceneData, rays: RayArena,
                           width: int, height: int, n0: int,
                           *, interpret: bool, use_reference: bool,
                           **meta) -> jax.Array:
    from gravit_tpu.ops import slice_march as sm

    # object-space transform: broadcast-multiply + small-axis sums, NOT an
    # unbatched matmul (MXU-bf16 parity hazard — see to_object_space NOTE)
    minv = scene.inst_minv[0]
    m3 = minv[:3, :3]
    o_obj = jnp.sum(m3[None, :, :] * rays.origin[:, None, :], axis=-1) \
        + minv[:3, 3]
    d_obj = jnp.sum(m3[None, :, :] * rays.direction[:, None, :], axis=-1)

    n = rays.capacity
    active = rays.active if rays.active.dtype == bool else rays.active > 0
    fn = sm.slice_march_reference if use_reference else functools.partial(
        sm.slice_march, interpret=interpret)
    subs = scene.vol_subgrids[0] if scene.vol_subgrids else ()
    color, w, _flags = fn(
        o_obj, d_obj, active, rays.color, rays.w,
        scene.vol_samples[0], scene.vol_color_lut[0],
        scene.vol_opacity_lut[0], subgrids=subs, **meta)

    # single brick: BOUNDARY rays have nowhere to requeue -> EXTERNAL ->
    # every primary deposits color*w (shuffle_volume's retirement rule)
    fb = image_lib.new_framebuffer(width, height)
    contrib = color * w[:, None]
    if n0 == width * height:
        # dense whole-film deposit: lane i == pixel i (camera lane order)
        rgba = jnp.concatenate(
            [contrib, jnp.ones((n, 1), jnp.float32)], axis=1)
        fb = fb + rgba[:n0]
    else:
        fb = image_lib.local_add(fb, rays.id, contrib,
                                 jnp.ones((n,), jnp.float32),
                                 active)
    return image_lib.clamp_rgb(fb)


def slice_axes_for(scene: VolumeSceneData, directions) -> tuple:
    """Static per-volume (axis, flip) | None tuple for march_round's
    slice_axes: a volume qualifies when it has no AMR/iso/slice features
    and every OBJECT-space ray, for EVERY instance referencing it, passes
    the dominant-axis gate (_slice_gate — object-space, sign-consistent).
    Computed host-side once per camera (directions is a host (N, 3)
    array). Accepts both a flat scene and the stacked per-device scene
    from partition_volume_scene (leading device axis on array leaves;
    transforms are identical across devices, inst_vol marks foreign
    instances with -1)."""
    import numpy as np

    if not scene.vol_meta:
        return ()
    iv = np.asarray(scene.inst_vol)
    minv = np.asarray(scene.inst_minv)
    if minv.ndim == 4:                     # stacked: (n_dev, I, 4, 4)
        minv = minv[0]
        uses = [(iv == v).any(axis=0) for v in range(scene.num_volumes)]
    else:
        uses = [iv == v for v in range(scene.num_volumes)]
    out = []
    for v in range(scene.num_volumes):
        iso_blocks = (v < len(scene.vol_isovalues)
                      and scene.vol_isovalues[v]
                      and not _features_on_slice_ok(scene, v))
        amr_blocks = (v < len(scene.vol_subgrids)
                      and scene.vol_subgrids[v]
                      and not _features_on_slice_ok(scene, v))
        slc_blocks = (v < len(scene.vol_slices) and scene.vol_slices[v]
                      and not _features_on_slice_ok(scene, v))
        feature = (amr_blocks or iso_blocks or slc_blocks)
        if feature:
            out.append(None)
            continue
        minvs = [minv[i] for i in np.nonzero(uses[v])[0]]
        ok, axis, flip = _slice_gate(minvs, directions) if minvs \
            else (False, 0, False)
        out.append((axis, flip) if ok else None)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_rounds",
                                             "unroll", "slice_axes",
                                             "slice_interpret"))
def trace_volume(scene: VolumeSceneData, arena: RayArena, width: int,
                 height: int, max_rounds: int = 64,
                 unroll: bool = False, slice_axes: tuple = (),
                 slice_interpret: bool = False) -> jax.Array:
    fb = image_lib.new_framebuffer(width, height)
    arena = filter_initial(scene, arena)

    def round_fn(arena, fb):
        arena = march_round(scene, arena, differentiable=unroll,
                            slice_axes=slice_axes,
                            slice_interpret=slice_interpret)
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
