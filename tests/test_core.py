"""Unit tests for math, camera, intersection — the per-kernel tests the
reference never had (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from gravit_tpu.core.math3d import aabb_intersect
from gravit_tpu.ops.intersect import (intersect_any, intersect_closest,
                                      moller_trumbore)
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.mesh import Mesh


def test_moller_trumbore_analytic():
    v0 = jnp.array([0.0, 0.0, -1.0])
    e1 = jnp.array([1.0, 0.0, 0.0])
    e2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([[0.25, 0.25, 1.0], [2.0, 2.0, 1.0], [0.25, 0.25, -2.0]])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
    hit, t, u, v = moller_trumbore(o, d, v0, e1, e2, 1e-6, 1e30)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(u[0], 0.25, rtol=1e-5)
    np.testing.assert_allclose(v[0], 0.25, rtol=1e-5)
    # third ray points away from the plane crossing: t = -1 -> rejected
    assert not bool(hit[2])


def test_intersect_closest_picks_nearest():
    # two parallel unit triangles at z=-1 and z=-2, same mesh
    v0 = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -2.0]])
    e1 = jnp.tile(jnp.array([[2.0, 0.0, 0.0]]), (2, 1))
    e2 = jnp.tile(jnp.array([[0.0, 2.0, 0.0]]), (2, 1))
    mesh_id = jnp.array([0, 0], jnp.int32)
    o = jnp.array([[0.5, 0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_closest(o, d, jnp.array([0]), jnp.array([True]),
                            v0, e1, e2, mesh_id, tile=128)
    assert int(hit.prim[0]) == 0
    np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-6)
    # mesh mismatch -> miss
    hit2 = intersect_closest(o, d, jnp.array([1]), jnp.array([True]),
                             v0, e1, e2, mesh_id, tile=128)
    assert int(hit2.prim[0]) == -1
    occ = intersect_any(o, d, jnp.array([0]), jnp.array([True]),
                        v0, e1, e2, mesh_id, tile=128)
    assert bool(occ[0])


def test_aabb_intersect_reference_semantics():
    lo = jnp.array([0.0, 0.0, 0.0])
    hi = jnp.array([1.0, 1.0, 1.0])
    o = jnp.array([[0.5, 0.5, 2.0], [0.5, 0.5, 0.5]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit, tnear = aabb_intersect(lo, hi, o, 1.0 / d, jnp.array([1e30, 1e30]),
                                update_eps=True)
    assert bool(hit[0])
    np.testing.assert_allclose(tnear[0], 1.0, rtol=1e-6)
    # origin INSIDE the box: tnear < 0 fails the update_eps check
    # (BVH leaf test quirk, RayPacket.h:194-203)
    assert not bool(hit[1])


def test_camera_rays_directions():
    cam = PerspectiveCamera(eye=(4.0, 0.0, 0.0), focus=(0.0, 0.0, 0.0),
                            up=(0.0, 1.0, 0.0), fov=np.pi / 2,
                            film_width=4, film_height=4, samples=1,
                            jitter_window=0.5)
    rays = cam.generate_rays()
    assert rays.capacity == 16
    np.testing.assert_allclose(np.asarray(rays.origin[0]), [4.0, 0.0, 0.0])
    d = np.asarray(rays.direction)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-6)
    # all rays point -x (camera looks from +x to origin)
    assert (d[:, 0] < 0).all()
    # pixel ids are j*W+i over 4x4
    np.testing.assert_array_equal(np.asarray(rays.id), np.arange(16))
    # jitter parity: x = (x0 - 0.5*jitter)*horz for samples=1
    # pixel (0,0): x0 = -1, y0 = -1 -> x = y = -1.25 * tan(fov/2)
    u = np.array([0.0, 0.0, -1.0])
    v = np.array([0.0, 1.0, 0.0])
    w = np.array([-1.0, 0.0, 0.0])
    expect = -1.25 * u - 1.25 * v + w
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(d[0], expect, rtol=1e-5)


def test_mesh_normals_and_degenerate_faces():
    m = Mesh()
    m.add_vertices(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]],
                            np.float32))
    # second face is degenerate (v4 == v1 position) -> dropped
    m.add_faces(np.array([[1, 2, 3], [1, 2, 4]]))
    assert len(m.faces) == 1
    cm = m.finish()
    np.testing.assert_allclose(cm.geom_normal[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(cm.shading_normals[0, 0], [0, 0, 1], atol=1e-6)
