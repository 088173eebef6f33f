"""Scene-level acceleration bundle: per-mesh flat BVHs concatenated for the
Pallas kernel, plus the leaf-order -> global-triangle mapping used to gather
shading data after a hit."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gravit_tpu.accel.bvh import LEAF_PAD_ROWS, FlatBVH, build_bvh
from gravit_tpu.scene.mesh import CompiledMesh


@struct.dataclass
class SceneBVH:
    bounds: jax.Array       # (Nn, 8) f32
    meta: jax.Array         # (Nn, 4) i32, leaf tri ranges in CONCAT leaf order
    tri: jax.Array          # (Tp, 12) f32 leaf-ordered v0|e1|e2|pad
    leaf2global: jax.Array  # (Tp,) i32 leaf-order row -> global tri id
    mesh_root: jax.Array    # (M,) i32 root node per mesh
    num_meshes: int = struct.field(pytree_node=False, default=0)


def build_scene_bvh(meshes: Sequence[CompiledMesh]) -> SceneBVH:
    bounds_parts, meta_parts, tri_parts, map_parts, roots = [], [], [], [], []
    node_off = 0
    tri_off = 0        # rows in the packed (leaf-order) triangle table
    global_off = 0     # global triangle ids follow build_scene concat order
    for m in meshes:
        bvh: FlatBVH = build_bvh(m.v0, m.e1, m.e2)
        nb = bvh.bounds.copy()
        mt = bvh.meta.copy()
        leaf = mt[:, 2] > 0
        mt[~leaf, 0] += node_off          # children
        mt[~leaf, 1] += node_off
        mt[leaf, 0] += tri_off            # leaf tri start in packed rows
        roots.append(node_off)
        node_off += nb.shape[0]

        order = bvh.order
        t = order.shape[0]
        packed = np.zeros((t, 12), np.float32)
        packed[:, 0:3] = m.v0[order]
        packed[:, 3:6] = m.e1[order]
        packed[:, 6:9] = m.e2[order]
        tri_parts.append(packed)
        map_parts.append(order.astype(np.int32) + global_off)
        bounds_parts.append(nb)
        meta_parts.append(mt)
        tri_off += t
        global_off += t

    tri = np.concatenate(tri_parts, axis=0)
    leaf2global = np.concatenate(map_parts)
    # tail padding so any leaf slice [start, start+8) is readable; padded
    # rows are degenerate (det == 0 -> never hit)
    pad = LEAF_PAD_ROWS
    tri = np.concatenate([tri, np.zeros((pad, 12), np.float32)], axis=0)
    leaf2global = np.concatenate(
        [leaf2global, np.zeros((pad,), np.int32)])

    return SceneBVH(
        bounds=jnp.asarray(np.concatenate(bounds_parts, axis=0)),
        meta=jnp.asarray(np.concatenate(meta_parts, axis=0)),
        tri=jnp.asarray(tri),
        leaf2global=jnp.asarray(leaf2global),
        mesh_root=jnp.asarray(np.asarray(roots, np.int32)),
        num_meshes=len(meshes),
    )
