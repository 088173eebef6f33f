"""trace_image_fast must agree with the looped tracer bit-for-bit on its
valid domain (one instance, max_depth=1) — it is the bench flagship path,
so equality is gated in CI on both the brute and the (interpreted) Pallas
accel intersectors."""

import os

import numpy as np
import pytest

from gravit_tpu.render.tracer import make_arena, trace_image, trace_image_fast
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import ambient_light, area_light, point_light

from scenes import cone_mesh, cube_mesh


def _single_instance(lights, w=32, h=32, samples=1):
    scene = build_scene(
        [cube_mesh()],
        [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        lights)
    cam = PerspectiveCamera(
        eye=(2.0, 0.6, 1.2), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=w, film_height=h,
        samples=samples, max_depth=1, jitter_window=0.5)
    return scene, cam


LIGHT_SETS = {
    "point": [point_light((1.5, 1.5, 0.0), (1.0, 0.8, 0.6))],
    "mixed": [point_light((1.5, 1.5, 0.0), (0.7, 0.7, 0.7)),
              ambient_light((0.1, 0.1, 0.15)),
              area_light((0.0, 2.0, 0.5), (0.9, 0.9, 0.9),
                         (0.0, -1.0, 0.0), 0.5, 0.5)],
}


@pytest.mark.parametrize("lights_key", sorted(LIGHT_SETS))
def test_fast_equals_loop_brute(lights_key):
    scene, cam = _single_instance(LIGHT_SETS[lights_key])
    rays = cam.generate_rays()
    arena = make_arena(rays, scene.num_lights)
    fb_loop = trace_image(scene, arena, 32, 32, max_rounds=8)
    fb_fast = trace_image_fast(scene, rays, 32, 32)
    np.testing.assert_array_equal(np.asarray(fb_loop)[:, :3],
                                  np.asarray(fb_fast)[:, :3])
    assert float(np.asarray(fb_fast)[:, :3].sum()) > 0.0


def test_fast_equals_loop_accel_interpret():
    _prev = os.environ.get("GRAVIT_PALLAS_INTERPRET")
    os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"
    try:
        from gravit_tpu.accel.scene_accel import build_scene_bvh

        scene, cam = _single_instance(LIGHT_SETS["mixed"])
        accel = build_scene_bvh([cube_mesh()])
        rays = cam.generate_rays()
        arena = make_arena(rays, scene.num_lights)
        fb_loop = trace_image(scene, arena, 32, 32, max_rounds=8,
                              accel=accel)
        fb_fast = trace_image_fast(scene, rays, 32, 32, accel=accel)
        np.testing.assert_array_equal(np.asarray(fb_loop)[:, :3],
                                      np.asarray(fb_fast)[:, :3])
    finally:
        if _prev is None:
            os.environ.pop("GRAVIT_PALLAS_INTERPRET", None)
        else:
            os.environ["GRAVIT_PALLAS_INTERPRET"] = _prev


def test_fast_samples4():
    # samples>1: several rays deposit into one pixel; the loop path's
    # top-down spawn lane order and the fast path's dense (light, lane)
    # order sum the same contributions in different float order, so this
    # case is allclose (1-sample parity configs above stay bit-exact)
    scene, cam = _single_instance(LIGHT_SETS["point"], samples=2)
    rays = cam.generate_rays()
    arena = make_arena(rays, scene.num_lights)
    fb_loop = trace_image(scene, arena, 32, 32, max_rounds=8)
    # multi-sample films stay dense via the samples reshape (pixel ==
    # lane // S^2); also check the general scatter path agrees
    fb_fast = trace_image_fast(scene, rays, 32, 32, samples=2)
    fb_scatter = trace_image_fast(scene, rays, 32, 32, dense_deposit=False)
    np.testing.assert_allclose(np.asarray(fb_fast), np.asarray(fb_scatter),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(fb_loop)[:, :3],
                               np.asarray(fb_fast)[:, :3],
                               atol=1e-6, rtol=0)


def test_fast_path_gradients_match_fd():
    """The megapass is a straight-line program (no while_loop), so it is
    reverse-mode differentiable as-is; check d loss / d kd and
    d loss / d light color against central finite differences."""
    import jax
    import jax.numpy as jnp

    scene, cam = _single_instance(LIGHT_SETS["point"], w=16, h=16)
    rays = cam.generate_rays()
    key = jax.random.key(5)
    target = jax.random.uniform(key, (16 * 16, 4))

    def loss(kd, lcolor):
        s = scene.replace(tri_kd=kd, lights_color=lcolor)
        fb = trace_image_fast(s, rays, 16, 16)
        return jnp.mean((fb - target) ** 2)

    g_kd, g_lc = jax.grad(loss, argnums=(0, 1))(scene.tri_kd,
                                                scene.lights_color)
    eps = 3e-3
    for name, g, p0, setter in [
        ("kd", g_kd, scene.tri_kd,
         lambda v: loss(v, scene.lights_color)),
        ("light_color", g_lc, scene.lights_color,
         lambda v: loss(scene.tri_kd, v)),
    ]:
        d = jax.random.normal(jax.random.key(7), p0.shape)
        analytic = float(jnp.vdot(g, d))
        fd = float((setter(p0 + eps * d) - setter(p0 - eps * d)) / (2 * eps))
        assert np.isfinite(analytic) and np.isfinite(fd), name
        np.testing.assert_allclose(analytic, fd, rtol=0.15, atol=1e-6,
                                   err_msg=name)


def test_fast_tile_order_64():
    """tile_order=True at a film with a NONTRIVIAL tile grid (64x64 ->
    2x2 grid of 32x32 tiles; at 32x32 the permutation is the identity and
    proves nothing). Bit-equality vs both the row-order fast path and the
    looped tracer. tile_order defaults ON since d7e35ec (golden-validated
    on hardware), so the row-order side must be pinned OFF explicitly."""
    scene, cam = _single_instance(LIGHT_SETS["mixed"], w=64, h=64)
    rays = cam.generate_rays()
    fb_row = trace_image_fast(scene, rays, 64, 64, tile_order=False)
    fb_tile = trace_image_fast(scene, rays, 64, 64, tile_order=True)
    np.testing.assert_array_equal(np.asarray(fb_row), np.asarray(fb_tile))
    arena = make_arena(rays, scene.num_lights)
    fb_loop = trace_image(scene, arena, 64, 64, max_rounds=8)
    np.testing.assert_array_equal(np.asarray(fb_loop), np.asarray(fb_tile))


def _bounce_scene(lights, w=32, h=32, max_depth=2):
    """Single mesh = cube sitting on a large floor quad, lit from above:
    primaries hit the floor, cosine bounces go up and many re-hit the
    cube's sides, so depth>1 generations really shade and deposit (a
    camera inside the cube cannot work: rays starting inside the
    instance AABB never queue — tnear > eps, reference BVH semantics)."""
    from gravit_tpu.scene.material import Material
    from gravit_tpu.scene.mesh import Mesh
    from scenes import CUBE_FACES, CUBE_VERTS

    m = Mesh()
    m.add_vertices(np.asarray(CUBE_VERTS).reshape(-1, 3))
    m.add_faces(np.asarray(CUBE_FACES))
    nv = len(CUBE_VERTS) // 3
    m.add_vertices(np.asarray([[-3.0, -0.5, -3.0], [3.0, -0.5, -3.0],
                               [3.0, -0.5, 3.0], [-3.0, -0.5, 3.0]]))
    m.add_faces(np.asarray([nv + 1, nv + 2, nv + 3,
                            nv + 1, nv + 3, nv + 4]))
    m.material = Material(kd=(1.0, 1.0, 1.0))
    compiled = m.finish()
    scene = build_scene(
        [compiled],
        [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        lights)
    cam = PerspectiveCamera(
        eye=(2.5, 2.0, 2.5), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(50.0 * np.pi / 180.0), film_width=w, film_height=h,
        samples=1, max_depth=max_depth, jitter_window=0.5)
    return scene, cam, compiled


@pytest.mark.parametrize("depth", [2, 3])
def test_fast_depth_k_equals_loop_brute(depth):
    """Depth-K megapass (VERDICT r4 missing #2): generation g's RNG seeds
    and deposits must reproduce looped round g exactly — bit-equality,
    not allclose."""
    scene, cam, _ = _bounce_scene(
        [point_light((0.0, 2.5, 0.0), (1.0, 0.8, 0.6))], max_depth=depth)
    rays = cam.generate_rays()
    arena = make_arena(rays, scene.num_lights)
    fb_loop = trace_image(scene, arena, 32, 32, max_rounds=depth + 4)
    fb_fast = trace_image_fast(scene, rays, 32, 32, max_depth=depth)
    np.testing.assert_array_equal(np.asarray(fb_loop)[:, :3],
                                  np.asarray(fb_fast)[:, :3])
    # the depth-2 image must actually differ from depth-1 (bounces fired)
    fb_d1 = trace_image_fast(scene, rays, 32, 32, max_depth=1)
    assert np.abs(np.asarray(fb_fast) - np.asarray(fb_d1)).max() > 0.0


def test_fast_depth_k_mixed_lights_accel_interpret():
    _prev = os.environ.get("GRAVIT_PALLAS_INTERPRET")
    os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"
    try:
        from gravit_tpu.accel.scene_accel import build_scene_bvh

        scene, cam, compiled = _bounce_scene(
            [point_light((0.0, 2.5, 0.0), (0.7, 0.7, 0.7)),
             ambient_light((0.1, 0.1, 0.15)),
             area_light((0.0, 2.0, 0.5), (0.9, 0.9, 0.9),
                        (0.0, -1.0, 0.0), 0.5, 0.5)], max_depth=3)
        accel = build_scene_bvh([compiled])
        rays = cam.generate_rays()
        arena = make_arena(rays, scene.num_lights)
        fb_loop = trace_image(scene, arena, 32, 32, max_rounds=8,
                              accel=accel)
        fb_fast = trace_image_fast(scene, rays, 32, 32, accel=accel,
                                   max_depth=3)
        # 3 lights x 3 generations: a pixel's deposits associate in lane
        # order in the loop vs dense light-group order here — 1 float ulp
        # on isolated pixels; bytes must still match exactly (the
        # point-light depth tests above stay bit-equal)
        np.testing.assert_allclose(np.asarray(fb_loop)[:, :3],
                                   np.asarray(fb_fast)[:, :3],
                                   atol=1e-6, rtol=0)
        from gravit_tpu.scene import image as img
        np.testing.assert_array_equal(
            img.to_rgb8(np.asarray(fb_loop), 32, 32),
            img.to_rgb8(np.asarray(fb_fast), 32, 32))
    finally:
        if _prev is None:
            os.environ.pop("GRAVIT_PALLAS_INTERPRET", None)
        else:
            os.environ["GRAVIT_PALLAS_INTERPRET"] = _prev
