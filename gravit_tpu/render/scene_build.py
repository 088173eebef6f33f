"""Compile host-side scene description into the device-resident SceneData.

The analog of GraviT's tracer Initialize() (algorithm/TracerBase.h:247-308),
which walks the context DB into meshRef/instM/instMinv/instMinvN maps + the
instance BVH. Here everything flattens into jnp arrays: all meshes
concatenate into one triangle soup (per-triangle mesh id keeps per-instance
"queues" separable inside one kernel pass); instances are SoA transform
tables; lights a fixed bundle.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gravit_tpu.core import math3d
from gravit_tpu.scene.light import Light, LightBundle, bundle_lights
from gravit_tpu.scene.mesh import CompiledMesh


@struct.dataclass
class SceneData:
    """Device-side scene; leaves are jnp arrays (differentiable leaves where
    it makes sense: triangle geometry, normals, materials, light params)."""

    # differentiable source geometry: concatenated vertex buffer + global
    # face indices; refresh_geometry() re-derives the triangle soup from
    # these so gradients flow to VERTICES (the north-star capability)
    vertices: jax.Array      # (V, 3)
    faces: jax.Array         # (T, 3) int32 into `vertices`

    # triangle soup over all meshes
    tri_v0: jax.Array        # (T, 3)
    tri_e1: jax.Array        # (T, 3)
    tri_e2: jax.Array        # (T, 3)
    tri_ng: jax.Array        # (T, 3) unit geometric normal
    tri_ns: jax.Array        # (T, 3, 3) per-corner shading normals
    tri_vcol: jax.Array      # (T, 3, 3) per-corner colors (1.0 if unused)
    tri_has_vcol: jax.Array  # (T,) bool
    tri_mesh: jax.Array      # (T,) i32
    tri_mat_type: jax.Array  # (T,) i32
    tri_kd: jax.Array        # (T, 3)
    tri_ks: jax.Array        # (T, 3)
    tri_alpha: jax.Array     # (T,)
    tri_eta: jax.Array       # (T, 3) embree material family
    tri_k: jax.Array         # (T, 3)
    tri_rough: jax.Array     # (T,)
    tri_hsc: jax.Array       # (T, 3)
    tri_bs: jax.Array        # (T,)
    tri_hsf: jax.Array       # (T,)

    # instances
    inst_mesh: jax.Array     # (I,) i32
    inst_lo: jax.Array       # (I, 3) world bbox (corner-transform, api.cpp:307-312)
    inst_hi: jax.Array       # (I, 3)
    inst_m: jax.Array        # (I, 4, 4)
    inst_minv: jax.Array     # (I, 4, 4)
    inst_normi: jax.Array    # (I, 3, 3)

    lights_kind: jax.Array   # (L,) i32
    lights_pos: jax.Array    # (L, 3)
    lights_color: jax.Array  # (L, 3)
    lights_u: jax.Array      # (L, 3)
    lights_w: jax.Array      # (L, 3)
    lights_wh: jax.Array     # (L, 2)

    # optional top-level instance BVH (accel/instance_bvh.py): built when
    # the instance count crosses INSTANCE_BVH_THRESHOLD so the shuffle is
    # log-time instead of the O(N x I) slab scan (BVH.cpp:77-216 analog).
    # None = scan path. Static tree (not differentiable wrt instance AABBs;
    # t_entry of the winning instance is recomputed differentiably).
    inst_bvh: object = None

    # static metadata
    num_instances: int = struct.field(pytree_node=False, default=0)
    num_lights: int = struct.field(pytree_node=False, default=0)
    num_meshes: int = struct.field(pytree_node=False, default=0)
    mesh_tri_offset: tuple = struct.field(pytree_node=False, default=())
    mesh_tri_count: tuple = struct.field(pytree_node=False, default=())
    has_embree_materials: bool = struct.field(pytree_node=False,
                                              default=False)
    # any phong/blinn triangles? False lets shade() statically skip the
    # two jnp.power specular branches (~6 ms/frame at 262K on v5e for
    # lambert-only scenes — scripts/micro_multi4.py)
    has_specular: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]


@dataclasses.dataclass
class Instance:
    mesh_id: int
    m: np.ndarray  # (4, 4) row-major world transform


INSTANCE_BVH_THRESHOLD = 64


def build_scene(meshes: Sequence[CompiledMesh],
                instances: Sequence[Instance],
                lights: Sequence[Light],
                pad_tris_to: Optional[int] = None,
                instance_bvh: Optional[bool] = None) -> SceneData:
    offsets, counts = [], []
    off = 0
    for m in meshes:
        offsets.append(off)
        counts.append(m.num_triangles)
        off += m.num_triangles

    cat = lambda parts: np.concatenate(parts, axis=0)
    # global vertex buffer + offset faces (for vertex-level autodiff)
    vert_parts, face_parts = [], []
    voff = 0
    for m in meshes:
        verts = np.zeros((m.num_vertices, 3), np.float32)
        # recover vertex positions from (v0, e1, e2): v0 at corner0 etc.
        verts[m.faces[:, 0]] = m.v0
        verts[m.faces[:, 1]] = m.v0 + m.e1
        verts[m.faces[:, 2]] = m.v0 + m.e2
        vert_parts.append(verts)
        face_parts.append(m.faces + voff)
        voff += m.num_vertices
    vertices = cat(vert_parts) if vert_parts else np.zeros((0, 3), np.float32)
    faces = cat(face_parts).astype(np.int32) if face_parts else np.zeros(
        (0, 3), np.int32)

    tri_v0 = cat([m.v0 for m in meshes])
    tri_e1 = cat([m.e1 for m in meshes])
    tri_e2 = cat([m.e2 for m in meshes])
    tri_ng = cat([m.geom_normal for m in meshes])
    tri_ns = cat([m.shading_normals for m in meshes])
    tri_vcol = cat([
        m.vertex_colors if m.vertex_colors is not None
        else np.ones((m.num_triangles, 3, 3), np.float32)
        for m in meshes
    ])
    tri_has_vcol = cat([
        np.full((m.num_triangles,), m.vertex_colors is not None)
        for m in meshes
    ])
    tri_mesh = cat([
        np.full((m.num_triangles,), i, np.int32) for i, m in enumerate(meshes)
    ])
    tri_mat_type = cat([m.mat_type for m in meshes])
    tri_kd = cat([m.mat_kd for m in meshes])
    tri_ks = cat([m.mat_ks for m in meshes])
    tri_alpha = cat([m.mat_alpha for m in meshes])
    tri_eta = cat([m.mat_eta for m in meshes])
    tri_k = cat([m.mat_k for m in meshes])
    tri_rough = cat([m.mat_rough for m in meshes])
    tri_hsc = cat([m.mat_hsc for m in meshes])
    tri_bs = cat([m.mat_bs for m in meshes])
    tri_hsf = cat([m.mat_hsf for m in meshes])

    t = tri_v0.shape[0]
    if pad_tris_to is not None and pad_tris_to > t:
        pad = pad_tris_to - t
        padz = lambda a: np.concatenate(
            [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        tri_v0, tri_e1, tri_e2 = padz(tri_v0), padz(tri_e1), padz(tri_e2)
        tri_ng, tri_ns, tri_vcol = padz(tri_ng), padz(tri_ns), padz(tri_vcol)
        tri_has_vcol = np.concatenate([tri_has_vcol, np.zeros((pad,), bool)])
        tri_mesh = np.concatenate([tri_mesh, np.full((pad,), -2, np.int32)])
        tri_mat_type = padz(tri_mat_type)
        tri_kd, tri_ks, tri_alpha = padz(tri_kd), padz(tri_ks), padz(tri_alpha)
        tri_eta, tri_k, tri_rough = padz(tri_eta), padz(tri_k), padz(tri_rough)
        tri_hsc, tri_bs, tri_hsf = padz(tri_hsc), padz(tri_bs), padz(tri_hsf)
        faces = np.concatenate([faces, np.zeros((pad, 3), np.int32)])

    n_inst = len(instances)
    inst_mesh = np.array([i.mesh_id for i in instances], np.int32)
    inst_m = np.stack([np.asarray(i.m, np.float32) for i in instances])
    inst_minv = np.stack([np.linalg.inv(m).astype(np.float32) for m in inst_m])
    inst_normi = np.stack([math3d.normal_matrix(m) for m in inst_m])
    # world bbox by transforming the two mesh-bbox corners, exactly as
    # api.cpp:307-312 (NOT a conservative 8-corner transform; parity quirk)
    lo, hi = [], []
    for i in instances:
        msh = meshes[i.mesh_id]
        m = np.asarray(i.m, np.float32)
        il = m[:3, :3] @ msh.bounds_min + m[:3, 3]
        ih = m[:3, :3] @ msh.bounds_max + m[:3, 3]
        lo.append(np.minimum(il, ih))
        hi.append(np.maximum(il, ih))
    inst_lo = np.stack(lo) if lo else np.zeros((0, 3), np.float32)
    inst_hi = np.stack(hi) if hi else np.zeros((0, 3), np.float32)

    lb: LightBundle = bundle_lights(list(lights))

    if instance_bvh is None:
        instance_bvh = n_inst >= INSTANCE_BVH_THRESHOLD
    ibvh = None
    if instance_bvh and n_inst > 1:
        from gravit_tpu.accel.instance_bvh import build_instance_bvh

        ibvh = build_instance_bvh(inst_lo, inst_hi)

    return SceneData(
        inst_bvh=ibvh,
        vertices=jnp.asarray(vertices), faces=jnp.asarray(faces),
        tri_v0=jnp.asarray(tri_v0), tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2), tri_ng=jnp.asarray(tri_ng),
        tri_ns=jnp.asarray(tri_ns), tri_vcol=jnp.asarray(tri_vcol),
        tri_has_vcol=jnp.asarray(tri_has_vcol),
        tri_mesh=jnp.asarray(tri_mesh),
        tri_mat_type=jnp.asarray(tri_mat_type), tri_kd=jnp.asarray(tri_kd),
        tri_ks=jnp.asarray(tri_ks), tri_alpha=jnp.asarray(tri_alpha),
        tri_eta=jnp.asarray(tri_eta), tri_k=jnp.asarray(tri_k),
        tri_rough=jnp.asarray(tri_rough), tri_hsc=jnp.asarray(tri_hsc),
        tri_bs=jnp.asarray(tri_bs), tri_hsf=jnp.asarray(tri_hsf),
        inst_mesh=jnp.asarray(inst_mesh),
        inst_lo=jnp.asarray(inst_lo), inst_hi=jnp.asarray(inst_hi),
        inst_m=jnp.asarray(inst_m), inst_minv=jnp.asarray(inst_minv),
        inst_normi=jnp.asarray(inst_normi),
        lights_kind=jnp.asarray(lb.kind), lights_pos=jnp.asarray(lb.position),
        lights_color=jnp.asarray(lb.color), lights_u=jnp.asarray(lb.u),
        lights_w=jnp.asarray(lb.w),
        lights_wh=jnp.asarray(np.stack([lb.width, lb.height], axis=-1)),
        num_instances=n_inst,
        num_lights=lb.count,
        num_meshes=len(meshes),
        mesh_tri_offset=tuple(offsets),
        mesh_tri_count=tuple(counts),
        has_embree_materials=bool(np.any(np.asarray(tri_mat_type) >= 3)),
        has_specular=bool(np.any((np.asarray(tri_mat_type) == 1)
                                 | (np.asarray(tri_mat_type) == 2))),
    )


def refresh_geometry(scene: SceneData, vertices: jax.Array) -> SceneData:
    """Re-derive the triangle soup from a (possibly updated) vertex buffer.

    Differentiable: gradients of rendered pixels wrt `vertices` flow through
    (v0, e1, e2), geometric normals, and the generateNormals()-style
    area-weighted vertex-normal accumulation (Mesh.cpp:116-155). Call inside
    a training step with `vertices` as the parameter.
    """
    f = scene.faces
    v0 = vertices[f[:, 0]]
    e1 = vertices[f[:, 1]] - v0
    e2 = vertices[f[:, 2]] - v0
    ng = jnp.cross(e1, e2)
    fn = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-30)
    vn = jnp.zeros_like(vertices)
    for k in range(3):
        vn = vn.at[f[:, k]].add(fn)
    vn = vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-30)
    tri_ns = jnp.stack([vn[f[:, 0]], vn[f[:, 1]], vn[f[:, 2]]], axis=1)
    return scene.replace(
        vertices=vertices, tri_v0=v0, tri_e1=e1, tri_e2=e2,
        tri_ng=fn, tri_ns=tri_ns,
    )
