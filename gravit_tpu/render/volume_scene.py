"""Device-side volume scene: bricks as domains, instances as placements.

The volume analog of scene_build.SceneData. Brick sample grids can differ in
shape, so they stay a tuple of per-volume leaves; everything per-instance is
SoA. Mirrors what the reference stores in the context DB for Volume nodes
(render/cntx/rcontext.h Volume schema + api.cpp createVolume path).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gravit_tpu.scene.volume import Volume


@struct.dataclass
class VolumeSceneData:
    # per-volume leaves (tuples: shapes differ between bricks)
    vol_samples: Tuple[jax.Array, ...]   # each (nz, ny, nx)
    vol_origin: Tuple[jax.Array, ...]    # each (3,)
    vol_spacing: Tuple[jax.Array, ...]   # each (3,)
    vol_lo: Tuple[jax.Array, ...]
    vol_hi: Tuple[jax.Array, ...]
    vol_color_lut: Tuple[jax.Array, ...]   # each (256, 3)
    vol_opacity_lut: Tuple[jax.Array, ...]  # each (256,)
    vol_vrange: Tuple[jax.Array, ...]      # each (2,)
    # instances
    inst_vol: jax.Array    # (I,) i32
    inst_lo: jax.Array     # (I, 3) world bbox
    inst_hi: jax.Array     # (I, 3)
    inst_minv: jax.Array   # (I, 4, 4)

    # AMR: per-volume tuple of (samples, origin, spacing, lo, hi), ordered
    # coarse -> fine (Volume.h griddata nesting)
    vol_subgrids: Tuple[tuple, ...] = ()

    # static
    num_instances: int = struct.field(pytree_node=False, default=0)
    num_volumes: int = struct.field(pytree_node=False, default=0)
    vol_step: tuple = struct.field(pytree_node=False, default=())
    vol_max_steps: tuple = struct.field(pytree_node=False, default=())
    vol_isovalues: tuple = struct.field(pytree_node=False, default=())
    vol_slices: tuple = struct.field(pytree_node=False, default=())
    # static per-volume geometry/TF metadata for the slice-march fast path
    # (ops/slice_march.py bakes these into its kernel): per volume a tuple
    # (origin3, spacing3, (low, high))
    vol_meta: tuple = struct.field(pytree_node=False, default=())


def build_volume_scene(volumes: Sequence[Volume],
                       instances: Sequence[Tuple[int, np.ndarray]]
                       ) -> VolumeSceneData:
    """instances: list of (volume_id, 4x4 world transform)."""
    vs, vo, vsp, vlo, vhi, vcl, vol_, vr = [], [], [], [], [], [], [], []
    steps, max_steps, subs = [], [], []
    for v in volumes:
        tf = v.tf
        assert tf is not None, "volume needs a transfer function"
        vs.append(jnp.asarray(v.samples))
        vo.append(jnp.asarray(v.origin))
        vsp.append(jnp.asarray(v.spacing))
        vlo.append(jnp.asarray(v.bounds_min))
        vhi.append(jnp.asarray(v.bounds_max))
        c, a, r = tf.device_luts()
        vcl.append(c)
        vol_.append(a)
        vr.append(r)
        steps.append(v.step_size())
        max_steps.append(v.max_steps())
        sub_list = []
        for sub in sorted(v.subgrids, key=lambda g: g.level):
            sub_list.append((
                jnp.asarray(sub.samples), jnp.asarray(sub.origin),
                jnp.asarray(sub.spacing), jnp.asarray(sub.bounds_min),
                jnp.asarray(sub.bounds_max)))
        subs.append(tuple(sub_list))

    inst_vol = np.array([i[0] for i in instances], np.int32)
    inst_m = np.stack([np.asarray(m, np.float32) for _, m in instances])
    inst_minv = np.stack([np.linalg.inv(m).astype(np.float32)
                          for m in inst_m])
    lo, hi = [], []
    for vid, m in instances:
        v = volumes[vid]
        m = np.asarray(m, np.float32)
        il = m[:3, :3] @ v.bounds_min + m[:3, 3]
        ih = m[:3, :3] @ v.bounds_max + m[:3, 3]
        lo.append(np.minimum(il, ih))
        hi.append(np.maximum(il, ih))

    return VolumeSceneData(
        vol_samples=tuple(vs), vol_origin=tuple(vo), vol_spacing=tuple(vsp),
        vol_lo=tuple(vlo), vol_hi=tuple(vhi),
        vol_color_lut=tuple(vcl), vol_opacity_lut=tuple(vol_),
        vol_vrange=tuple(vr),
        inst_vol=jnp.asarray(inst_vol),
        inst_lo=jnp.asarray(np.stack(lo)), inst_hi=jnp.asarray(np.stack(hi)),
        inst_minv=jnp.asarray(inst_minv),
        vol_subgrids=tuple(subs),
        num_instances=len(instances), num_volumes=len(volumes),
        vol_step=tuple(steps), vol_max_steps=tuple(max_steps),
        vol_isovalues=tuple(tuple(float(x) for x in v.isovalues)
                            for v in volumes),
        vol_slices=tuple(tuple(tuple(float(x) for x in pl)
                               for pl in v.slices) for v in volumes),
        vol_meta=tuple(
            (tuple(float(x) for x in v.origin),
             tuple(float(x) for x in v.spacing),
             (float(v.tf.low), float(v.tf.high)))
            for v in volumes),
    )
