"""Small-vector math on batched arrays (replaces glm usage in the reference).

Everything operates on `(..., 3)` float32 arrays so it vectorizes on the VPU.
Reference semantics: src/gvt/core/Math.h, src/gvt/render/data/primitives/BBox.h.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FLT_MAX = np.float32(np.finfo(np.float32).max)


def dot(a, b):
    """Batched 3-vector dot product along the last axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a, eps: float = 0.0):
    """normalize like glm: no epsilon guard by default (0/0 -> nan, as glm)."""
    n = length(a)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def transform_points(m, p):
    """Apply a 4x4 transform to points `(..., 3)` (w = 1)."""
    return p @ m[:3, :3].T + m[:3, 3]


def transform_vectors(m, v):
    """Apply a 4x4 (or 3x3) transform to direction vectors (w = 0)."""
    return v @ m[:3, :3].T


def mat4_translate_scale(t, s):
    """T @ S composite, matching glm::scale(glm::translate(I, t), s).

    Reference: src/apps/render/SimpleApp.cpp:170-172 builds instances this way.
    """
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.diag(np.asarray(s, dtype=np.float32))
    m[:3, 3] = np.asarray(t, dtype=np.float32)
    return m


def normal_matrix(m):
    """transpose(inverse(mat3(m))) as in reference api.cpp:303-306."""
    m = np.asarray(m, dtype=np.float32)
    return np.transpose(np.linalg.inv(m[:3, :3])).astype(np.float32)


def aabb_intersect(lo, hi, origin, inv_dir, t_limit, update_eps: bool):
    """Slab test of rays against one-or-many AABBs, reference semantics.

    Replicates RayPacketIntersection<N>::intersect (actor/RayPacket.h:110-203):
    hit iff `tfar > tnear` AND (when `update_eps`) `tnear > RAY_EPSILON`
    AND `t_limit > tnear`.

    All of lo/hi/origin/inv_dir broadcast against each other on leading axes;
    the last axis is xyz. Returns (hit_mask, tnear).
    """
    l = (lo - origin) * inv_dir
    u = (hi - origin) * inv_dir
    tmin = jnp.minimum(l, u)
    tmax = jnp.maximum(l, u)
    tnear = jnp.max(tmin, axis=-1)
    tfar = jnp.min(tmax, axis=-1)
    hit = tfar > tnear
    if update_eps:
        hit = hit & (tnear > 1e-6)
    hit = hit & (t_limit > tnear)
    return hit, tnear


def aabb_entry_exit(lo, hi, origin, inv_dir):
    """Entry/exit distances of rays vs AABB (for volume brick clipping)."""
    l = (lo - origin) * inv_dir
    u = (hi - origin) * inv_dir
    tnear = jnp.max(jnp.minimum(l, u), axis=-1)
    tfar = jnp.min(jnp.maximum(l, u), axis=-1)
    return tnear, tfar


def merge_aabbs(los, his):
    """Union of a set of AABBs -> (lo, hi). numpy, host-side."""
    return np.min(np.asarray(los), axis=0), np.max(np.asarray(his), axis=0)


def aabb_surface_area(lo, hi):
    d = np.maximum(np.asarray(hi) - np.asarray(lo), 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])
