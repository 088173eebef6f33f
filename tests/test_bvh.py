"""BVH builder + Pallas packet-traversal kernel vs brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gravit_tpu.accel.bvh import build_bvh, bvh_intersect_numpy
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.ops.intersect import intersect_closest
from gravit_tpu.ops.pallas_bvh import PACKET, bvh_intersect
from gravit_tpu.scene.material import Material
from gravit_tpu.scene.mesh import Mesh


def random_mesh(rng, n_tris=200, spread=2.0):
    m = Mesh()
    base = rng.uniform(-spread, spread, size=(n_tris, 3)).astype(np.float32)
    verts = np.concatenate([
        base,
        base + rng.normal(scale=0.4, size=(n_tris, 3)).astype(np.float32),
        base + rng.normal(scale=0.4, size=(n_tris, 3)).astype(np.float32),
    ], axis=0)
    faces = np.stack([
        np.arange(n_tris), np.arange(n_tris) + n_tris,
        np.arange(n_tris) + 2 * n_tris], axis=1) + 1
    m.add_vertices(verts)
    m.add_faces(faces)
    m.material = Material()
    return m.finish()


def test_bvh_build_covers_all_triangles():
    rng = np.random.default_rng(0)
    cm = random_mesh(rng, 333)
    bvh = build_bvh(cm.v0, cm.e1, cm.e2)
    assert sorted(bvh.order.tolist()) == list(range(333))
    # every leaf range valid
    leaf = bvh.meta[:, 2] > 0
    assert (bvh.meta[leaf, 1] > 0).all()
    assert bvh.depth < 60


def test_numpy_traversal_matches_brute():
    rng = np.random.default_rng(1)
    cm = random_mesh(rng, 120)
    bvh = build_bvh(cm.v0, cm.e1, cm.e2)
    v0l, e1l, e2l = cm.v0[bvh.order], cm.e1[bvh.order], cm.e2[bvh.order]

    o = np.array([0.0, 0.0, 6.0], np.float32)
    hits = 0
    for k in range(40):
        d = rng.normal(size=3).astype(np.float32)
        d[2] = -abs(d[2]) - 0.5
        d /= np.linalg.norm(d)
        t, prim, u, v = bvh_intersect_numpy(bvh, v0l, e1l, e2l, o, d)
        bh = intersect_closest(
            jnp.asarray(o)[None], jnp.asarray(d)[None],
            jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
            jnp.asarray(cm.v0), jnp.asarray(cm.e1), jnp.asarray(cm.e2),
            jnp.zeros(cm.num_triangles, jnp.int32), tile=128)
        if prim >= 0:
            hits += 1
            assert int(bvh.order[prim]) == int(bh.prim[0])
            np.testing.assert_allclose(t, float(bh.t[0]), rtol=1e-5)
        else:
            assert int(bh.prim[0]) == -1
    assert hits >= 3


@pytest.mark.parametrize("n_tris", [37, 400])
def test_pallas_kernel_interpret_matches_brute(n_tris):
    rng = np.random.default_rng(2)
    cm = random_mesh(rng, n_tris)
    sbvh = build_scene_bvh([cm])

    n = PACKET
    o = np.tile(np.array([[0.0, 0.0, 6.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    valid = np.ones((n,), np.int32)
    valid[::7] = 0
    block_root = np.zeros((n // PACKET,), np.int32)

    t, prim, u, v = bvh_intersect(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(valid),
        jnp.asarray(block_root), sbvh.bounds, sbvh.meta, sbvh.tri,
        interpret=True)

    bh = intersect_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.where(jnp.asarray(valid) > 0, 0, -1), jnp.ones(n, bool),
        jnp.asarray(cm.v0), jnp.asarray(cm.e1), jnp.asarray(cm.e2),
        jnp.zeros(cm.num_triangles, jnp.int32), tile=128)

    prim_global = np.where(np.asarray(prim) >= 0,
                           np.asarray(sbvh.leaf2global)[np.asarray(prim)], -1)
    np.testing.assert_array_equal(prim_global, np.asarray(bh.prim))
    hit = prim_global >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(bh.t)[hit],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u)[hit], np.asarray(bh.u)[hit],
                               rtol=2e-4, atol=2e-5)


def test_pallas_any_hit_mode():
    """any_hit mode agrees with closest-hit on WHETHER each ray hits."""
    rng = np.random.default_rng(5)
    cm = random_mesh(rng, 300)
    sbvh = build_scene_bvh([cm])
    n = PACKET
    o = np.tile(np.array([[0.0, 0.0, 6.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    valid = np.ones((n,), np.int32)
    block_root = np.zeros((n // PACKET,), np.int32)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(valid),
            jnp.asarray(block_root), sbvh.bounds, sbvh.meta, sbvh.tri)
    _, p_closest, _, _ = bvh_intersect(*args, interpret=True)
    _, p_any, _, _ = bvh_intersect(*args, interpret=True, any_hit=True)
    np.testing.assert_array_equal(np.asarray(p_closest) >= 0,
                                  np.asarray(p_any) >= 0)


def test_pallas_tri_in_hbm_matches_vmem():
    """HBM-resident triangles with per-leaf DMA give identical results."""
    rng = np.random.default_rng(9)
    cm = random_mesh(rng, 500)
    sbvh = build_scene_bvh([cm])
    n = PACKET
    o = np.tile(np.array([[0.0, 0.0, 6.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    valid = np.ones((n,), np.int32)
    block_root = np.zeros((n // PACKET,), np.int32)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(valid),
            jnp.asarray(block_root), sbvh.bounds, sbvh.meta, sbvh.tri)
    t0, p0, u0, v0 = bvh_intersect(*args, interpret=True, tri_in_hbm=False)
    t1, p1, u1, v1 = bvh_intersect(*args, interpret=True, tri_in_hbm=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1))
