"""Segment-aligned multi-mesh kernel dispatch vs brute force.

`_intersect_bvh` packs the wavefront into PACKET-aligned (mesh, shadow)
segments so the whole round costs at most two Pallas dispatches. This
exercises the packing with 3 meshes, sparse scattered occupancy, and mixed
shadow/primary lanes, comparing against the jnp brute-force oracle
(ops/intersect.intersect_closest).
"""

import os

import numpy as np

os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"

import jax.numpy as jnp

import scenes
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.core.math3d import mat4_translate_scale  # noqa: F401
from gravit_tpu.ops.intersect import FLT_MAX, intersect_closest
from gravit_tpu.render.tracer import _intersect_bvh


def _scaled_cone():
    import dataclasses
    m = scenes.cone_mesh()
    return dataclasses.replace(m, v0=m.v0 * 0.6, e1=m.e1 * 0.6,
                               e2=m.e2 * 0.6)


def _global_tables(meshes):
    v0 = np.concatenate([m.v0 for m in meshes])
    e1 = np.concatenate([m.e1 for m in meshes])
    e2 = np.concatenate([m.e2 for m in meshes])
    mesh_id = np.concatenate(
        [np.full((m.v0.shape[0],), i, np.int32) for i, m in enumerate(meshes)])
    return (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(mesh_id))


def test_segment_dispatch_matches_brute():
    meshes = [scenes.cone_mesh(), scenes.cube_mesh(), _scaled_cone()]
    accel = build_scene_bvh(meshes)
    v0, e1, e2, tri_mesh = _global_tables(meshes)

    rng = np.random.default_rng(7)
    n = 2048
    # rays from a shell around the origin pointing roughly inward: a healthy
    # mix of hits and misses against the unit-scale test meshes
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o *= 2.0 / np.linalg.norm(o, axis=1, keepdims=True)
    d = -o + 0.3 * rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    ray_mesh = jnp.asarray(rng.integers(0, 3, size=n, dtype=np.int32))
    queued = jnp.asarray(rng.random(n) < 0.3)          # sparse, scattered
    is_shadow = jnp.asarray(rng.random(n) < 0.5)

    got = _intersect_bvh(None, accel, o, d, ray_mesh, queued,
                         is_shadow=is_shadow)
    want = intersect_closest(o, d, ray_mesh, queued, v0, e1, e2, tri_mesh)

    q = np.asarray(queued)
    sh = np.asarray(is_shadow)
    primary = q & ~sh
    shadow = q & sh

    # primary lanes: exact closest-hit agreement
    np.testing.assert_array_equal(np.asarray(got.prim)[primary],
                                  np.asarray(want.prim)[primary])
    np.testing.assert_allclose(np.asarray(got.t)[primary],
                               np.asarray(want.t)[primary], rtol=1e-5)
    hitp = primary & (np.asarray(want.prim) >= 0)
    np.testing.assert_allclose(np.asarray(got.u)[hitp],
                               np.asarray(want.u)[hitp], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v)[hitp],
                               np.asarray(want.v)[hitp], atol=1e-5)

    # shadow lanes run the any-hit early-exit pass: only occlusion matters
    np.testing.assert_array_equal((np.asarray(got.prim) >= 0)[shadow],
                                  (np.asarray(want.prim) >= 0)[shadow])

    # unqueued lanes come back as misses
    np.testing.assert_array_equal(np.asarray(got.prim)[~q], -1)
    assert np.all(np.asarray(got.t)[~q] >= FLT_MAX)

    # coverage sanity: the test actually exercised hits in every segment
    for m in range(3):
        assert (np.asarray(want.prim)[primary & (np.asarray(ray_mesh) == m)]
                >= 0).any()


def test_segment_dispatch_no_shadow_and_all_dead():
    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    accel = build_scene_bvh(meshes)
    v0, e1, e2, tri_mesh = _global_tables(meshes)

    rng = np.random.default_rng(11)
    n = 1024
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o *= 2.0 / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ray_mesh = jnp.asarray(rng.integers(0, 2, size=n, dtype=np.int32))

    # is_shadow=None path (e.g. primary-only rounds)
    queued = jnp.asarray(rng.random(n) < 0.5)
    got = _intersect_bvh(None, accel, o, d, ray_mesh, queued, is_shadow=None)
    want = intersect_closest(o, d, ray_mesh, queued, v0, e1, e2, tri_mesh)
    q = np.asarray(queued)
    np.testing.assert_array_equal(np.asarray(got.prim)[q],
                                  np.asarray(want.prim)[q])

    # fully dead wavefront: every segment empty, all blocks skipped
    dead = jnp.zeros((n,), bool)
    got = _intersect_bvh(None, accel, o, d, ray_mesh, dead,
                         is_shadow=jnp.zeros((n,), bool))
    assert np.all(np.asarray(got.prim) == -1)
    assert np.all(np.asarray(got.t) >= FLT_MAX)


def test_packed_path_matches_inplace():
    """The r5 in-place per-(mesh, shadow) strategy serves M <= LIMIT; the
    packed path must stay live and BIT-equal to it (it serves large mesh
    counts and is the reference construction)."""
    import gravit_tpu.render.tracer as tracer_mod

    meshes = [scenes.cone_mesh(), scenes.cube_mesh(), _scaled_cone()]
    accel = build_scene_bvh(meshes)

    rng = np.random.default_rng(23)
    n = 2048
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o *= 2.0 / np.linalg.norm(o, axis=1, keepdims=True)
    d = -o + 0.3 * rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ray_mesh = jnp.asarray(rng.integers(0, 3, size=n, dtype=np.int32))
    queued = jnp.asarray(rng.random(n) < 0.4)
    is_shadow = jnp.asarray(rng.random(n) < 0.5)

    got_ip = _intersect_bvh(None, accel, o, d, ray_mesh, queued,
                            is_shadow=is_shadow)
    limit = tracer_mod.INPLACE_MESH_LIMIT
    tracer_mod.INPLACE_MESH_LIMIT = 0      # force the packed path
    try:
        got_pk = _intersect_bvh(None, accel, o, d, ray_mesh, queued,
                                is_shadow=is_shadow)
    finally:
        tracer_mod.INPLACE_MESH_LIMIT = limit
    q = np.asarray(queued)
    sh = np.asarray(is_shadow)
    primary = q & ~sh
    np.testing.assert_array_equal(np.asarray(got_ip.prim)[primary],
                                  np.asarray(got_pk.prim)[primary])
    np.testing.assert_array_equal(np.asarray(got_ip.t)[primary],
                                  np.asarray(got_pk.t)[primary])
    # shadow lanes: occlusion verdicts identical (any-hit may report
    # different witnesses)
    np.testing.assert_array_equal((np.asarray(got_ip.prim) >= 0)[q & sh],
                                  (np.asarray(got_pk.prim) >= 0)[q & sh])
