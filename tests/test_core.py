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


def test_embree_material_family():
    """Metal/velvet/matte BRDFs evaluate finitely and sensibly."""
    import jax.numpy as jnp
    from gravit_tpu.scene.material import MaterialType, eval_embree

    n = 4
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wi = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (n, 1))
    wo = jnp.tile(jnp.asarray([[0.0, -0.6, 0.8]]), (n, 1))
    kd = jnp.full((n, 3), 0.5)
    ks = jnp.full((n, 3), 0.9)
    eta = jnp.tile(jnp.asarray([[0.19, 1.45, 1.50]]), (n, 1))
    kk = jnp.tile(jnp.asarray([[3.06, 2.40, 1.88]]), (n, 1))
    mt = jnp.asarray([int(MaterialType.EMBREE_MATERIAL_MATTE),
                      int(MaterialType.EMBREE_MATERIAL_VELVET),
                      int(MaterialType.EMBREE_MATERIAL_METAL),
                      int(MaterialType.EMBREE_MATERIAL_METAL)])
    out = eval_embree(mt, ks, eta, kk, jnp.full((n,), 0.05),
                      jnp.full((n, 3), 0.4), jnp.full((n,), 2.0),
                      jnp.full((n,), 5.0), wo, normal, wi, kd)
    a = np.asarray(out)
    assert np.isfinite(a).all()
    # matte row: kd * cos(theta_i) = 0.5*0.8
    np.testing.assert_allclose(a[0], 0.5 * 0.8, rtol=1e-5)
    # metal reflects mostly at the mirror direction: nonzero here
    assert a[2].sum() > 0


def test_embree_metal_render():
    """Full render with a metal bunny-less scene: finite, lit."""
    import scenes
    from gravit_tpu.render.scene_build import build_scene, Instance
    from gravit_tpu.render.tracer import make_arena, trace_image
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.material import Material, MaterialType
    from gravit_tpu.core.math3d import mat4_translate_scale

    cone = scenes.cone_mesh()
    m = scenes.Mesh() if False else None
    import numpy as _np
    mesh_obj = scenes.cube_mesh()
    # rebuild cube with metal material
    from gravit_tpu.scene.mesh import Mesh as _Mesh
    mm = _Mesh()
    mm.add_vertices(_np.asarray(scenes.CUBE_VERTS))
    mm.add_faces(_np.asarray(scenes.CUBE_FACES))
    mm.material = Material(type=int(MaterialType.EMBREE_MATERIAL_METAL),
                           ks=(0.9, 0.7, 0.4))
    metal_cube = mm.finish()
    scene = build_scene(
        [metal_cube],
        [Instance(mesh_id=0, m=mat4_translate_scale((0, 0, 0),
                                                    (0.4, 0.4, 0.4)))],
        [point_light((2.0, 2.0, 0.0), (1.0, 1.0, 1.0))])
    from gravit_tpu.scene.camera import PerspectiveCamera
    cam = PerspectiveCamera(eye=(2.0, 1.0, 0.0), focus=(0.0, 0.0, 0.0),
                            up=(0.0, 1.0, 0.0), fov=np.pi / 4,
                            film_width=24, film_height=24)
    arena = make_arena(cam.generate_rays(), 1)
    fb = np.asarray(trace_image(scene, arena, 24, 24, max_rounds=16))
    assert np.isfinite(fb).all()
    assert (fb[:, :3].sum(-1) > 0).sum() > 10
