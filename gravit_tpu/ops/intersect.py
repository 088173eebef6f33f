"""Ray-triangle intersection (Möller-Trumbore) — jnp wavefront implementation.

This is the TPU re-design of the reference's Embree adapter inner loop
(adapter/embree/EmbreeMeshAdapter.cpp:436-622): instead of 4/8/16-wide SIMD
packets, the whole ray wavefront `(N,)` is intersected against triangle tiles
`(TT,)` as `(N, TT)` vectorized ops, reduced with a `lax.scan` over tiles.
Every ray carries a mesh id; a triangle only competes for rays whose mesh
matches, so ONE pass over the concatenated triangle buffer intersects every
per-instance "queue" simultaneously (GraviT's queue-of-queues collapses into
a masked reduction).

The Pallas BVH kernel (ops/pallas/) replaces this for large meshes; this
implementation stays as the differentiable + correctness reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

FLT_MAX = float(jnp.finfo(jnp.float32).max)
RAY_EPSILON = 1e-6


class Hit(NamedTuple):
    t: jax.Array      # (N,) f32, FLT_MAX on miss
    prim: jax.Array   # (N,) i32, -1 on miss
    u: jax.Array      # (N,) f32 barycentric (edge1 axis)
    v: jax.Array      # (N,) f32 barycentric (edge2 axis)


def moller_trumbore(o, d, v0, e1, e2, tnear, tfar):
    """Batched Möller-Trumbore. o/d: (..., 3); v0/e1/e2: (..., 3) broadcastable.

    No backface culling (Embree default). Returns (hit, t, u, v).
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = jnp.where(det != 0.0, 1.0 / det_safe, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tnear)
        & (t < tfar)
    )
    return hit, t, u, v


@functools.partial(jax.jit, static_argnames=("tile",))
def intersect_closest(o, d, ray_mesh, active, tri_v0, tri_e1, tri_e2,
                      tri_mesh, tile: int = 2048) -> Hit:
    """Closest-hit of rays (object space) against the global triangle soup.

    o, d         : (N, 3) object-space origin/direction (unnormalized d keeps
                   t consistent with world space, like rtcSetTransform)
    ray_mesh     : (N,) mesh id per ray (from its instance); -1 rays skip
    tri_mesh     : (T,) mesh id per triangle
    Semantics match Embree tnear=RAY_EPSILON, tfar=FLT_MAX
    (EmbreeMeshAdapter.cpp:277-278).
    """
    n = o.shape[0]
    t_count = tri_v0.shape[0]
    pad = (-t_count) % tile
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        tri_v0, tri_e1, tri_e2 = padf(tri_v0), padf(tri_e1), padf(tri_e2)
        tri_mesh = jnp.concatenate(
            [tri_mesh, jnp.full((pad,), -2, tri_mesh.dtype)])
    num_tiles = tri_v0.shape[0] // tile

    tiles = (
        tri_v0.reshape(num_tiles, tile, 3),
        tri_e1.reshape(num_tiles, tile, 3),
        tri_e2.reshape(num_tiles, tile, 3),
        tri_mesh.reshape(num_tiles, tile),
        (jnp.arange(num_tiles * tile, dtype=jnp.int32).reshape(num_tiles, tile)),
    )

    init = Hit(
        t=jnp.full((n,), FLT_MAX, jnp.float32),
        prim=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
    )
    live = active & (ray_mesh >= 0)

    def body(best, tri):
        tv0, te1, te2, tmesh, tid = tri
        # (N, TT) broadcast: rays on rows, triangles on cols
        hit, t, u, v = moller_trumbore(
            o[:, None, :], d[:, None, :],
            tv0[None, :, :], te1[None, :, :], te2[None, :, :],
            RAY_EPSILON, FLT_MAX,
        )
        hit = hit & (tmesh[None, :] == ray_mesh[:, None]) & live[:, None]
        t = jnp.where(hit, t, FLT_MAX)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        t_best = t[rows, j]
        closer = t_best < best.t
        return Hit(
            t=jnp.where(closer, t_best, best.t),
            prim=jnp.where(closer, tid[j], best.prim),
            u=jnp.where(closer, u[rows, j], best.u),
            v=jnp.where(closer, v[rows, j], best.v),
        ), None

    best, _ = jax.lax.scan(body, init, tiles)
    return best


@functools.partial(jax.jit, static_argnames=("tile",))
def intersect_any(o, d, ray_mesh, active, tri_v0, tri_e1, tri_e2, tri_mesh,
                  tile: int = 2048) -> jax.Array:
    """Any-hit (occlusion) test; returns (N,) bool occluded.

    Shadow quirk parity: direction is unnormalized and tfar=FLT_MAX
    (EmbreeMeshAdapter.cpp:277-278 sets tfar=FLT_MAX even for occlusion), so
    occluders beyond the light also block — reproduced deliberately.
    """
    n = o.shape[0]
    t_count = tri_v0.shape[0]
    pad = (-t_count) % tile
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        tri_v0, tri_e1, tri_e2 = padf(tri_v0), padf(tri_e1), padf(tri_e2)
        tri_mesh = jnp.concatenate(
            [tri_mesh, jnp.full((pad,), -2, tri_mesh.dtype)])
    num_tiles = tri_v0.shape[0] // tile
    tiles = (
        tri_v0.reshape(num_tiles, tile, 3),
        tri_e1.reshape(num_tiles, tile, 3),
        tri_e2.reshape(num_tiles, tile, 3),
        tri_mesh.reshape(num_tiles, tile),
    )
    live = active & (ray_mesh >= 0)

    def body(occ, tri):
        tv0, te1, te2, tmesh = tri
        hit, _, _, _ = moller_trumbore(
            o[:, None, :], d[:, None, :],
            tv0[None, :, :], te1[None, :, :], te2[None, :, :],
            RAY_EPSILON, FLT_MAX,
        )
        hit = hit & (tmesh[None, :] == ray_mesh[:, None]) & live[:, None]
        return occ | jnp.any(hit, axis=1), None

    occluded, _ = jax.lax.scan(body, jnp.zeros((n,), jnp.bool_), tiles)
    return occluded
