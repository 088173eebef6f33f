"""Top-level instance BVH (accel/instance_bvh.py) must agree EXACTLY with
the O(N x I) scan shuffle (same leaf predicate, same argmin/lowest-index
tie-break) and stay sublinear in instance count."""

import numpy as np
import jax.numpy as jnp

from gravit_tpu.accel.instance_bvh import (FLT_MAX, build_instance_bvh,
                                           closest_instance)
from gravit_tpu.core.math3d import mat4_translate_scale
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.render.tracer import make_arena, trace_image

from scenes import simple_scene, cone_mesh, cube_mesh

RAY_EPSILON = 1e-6


def _brute(lo, hi, o, d, t_max, exclude):
    inv = 1.0 / np.where(np.abs(d) < 1e-30, np.where(d < 0, -1e-30, 1e-30), d)
    l = (lo[None] - o[:, None]) * inv[:, None]
    u = (hi[None] - o[:, None]) * inv[:, None]
    tnear = np.minimum(l, u).max(axis=-1)
    tfar = np.maximum(l, u).min(axis=-1)
    ids = np.arange(lo.shape[0])[None, :]
    ok = ((tfar > tnear) & (tnear > RAY_EPSILON)
          & (tnear < t_max[:, None]) & (ids != exclude[:, None]))
    tnear = np.where(ok, tnear, FLT_MAX)
    best = tnear.argmin(axis=1)
    bt = tnear[np.arange(o.shape[0]), best]
    return np.where(bt < FLT_MAX, best, -1), bt


def test_tree_matches_brute_random_boxes():
    rng = np.random.default_rng(7)
    n_box, n_ray = 300, 512
    lo = rng.uniform(-5, 4, (n_box, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 1.5, (n_box, 3)).astype(np.float32)
    bvh = build_instance_bvh(lo, hi)

    o = rng.uniform(-6, 6, (n_ray, 3)).astype(np.float32)
    d = rng.normal(size=(n_ray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.where(rng.random(n_ray) < 0.3, 3.0, FLT_MAX).astype(np.float32)
    exclude = rng.integers(-1, n_box, n_ray).astype(np.int32)

    inv = jnp.asarray(1.0 / np.where(np.abs(d) < 1e-30, 1e30, d))
    found, inst, t = closest_instance(
        bvh, jnp.asarray(o), inv, jnp.asarray(t_max), jnp.asarray(exclude),
        jnp.ones((n_ray,), bool))
    b_inst, b_t = _brute(lo, hi, o, d, t_max, exclude)
    np.testing.assert_array_equal(np.asarray(inst), b_inst)
    hitm = b_inst >= 0
    # numpy brute vs XLA differ by FMA rounding; scan-vs-tree bit equality
    # inside JAX is pinned by test_render_with_tree_bit_equal
    np.testing.assert_allclose(np.asarray(t)[hitm], b_t[hitm], rtol=1e-6)
    assert hitm.sum() > 50  # the scene actually exercises hits


def test_tree_scales_to_4096_instances():
    rng = np.random.default_rng(3)
    n_box = 4096
    g = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float32)
    lo = g + rng.uniform(0.1, 0.3, (n_box, 3)).astype(np.float32)
    hi = lo + 0.5
    bvh = build_instance_bvh(lo, hi)
    assert bvh.num_nodes == 2 * n_box - 1  # leaf=1 binary tree

    n_ray = 256
    o = np.full((n_ray, 3), -2.0, np.float32)
    o[:, 1] = rng.uniform(0, 16, n_ray)
    o[:, 2] = rng.uniform(0, 16, n_ray)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n_ray, 1))
    t_max = np.full((n_ray,), FLT_MAX, np.float32)
    exclude = np.full((n_ray,), -1, np.int32)
    inv = jnp.asarray(np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1e30))
    found, inst, t = closest_instance(
        bvh, jnp.asarray(o), inv, jnp.asarray(t_max), jnp.asarray(exclude),
        jnp.ones((n_ray,), bool))
    b_inst, _ = _brute(lo, hi, o, d, t_max, exclude)
    np.testing.assert_array_equal(np.asarray(inst), b_inst)


def test_render_with_tree_bit_equal():
    """simple-scene render through the tree shuffle == scan shuffle."""
    scene_scan, cam = simple_scene(32, 32)
    assert scene_scan.inst_bvh is None
    meshes = [cone_mesh(), cube_mesh()]
    instances = []
    k = 0
    for i in range(-2, 3):
        for j in range(-2, 3):
            instances.append(Instance(
                mesh_id=k % 2,
                m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                       (0.4, 0.4, 0.4))))
            k += 1
    from gravit_tpu.scene.light import point_light

    scene_tree = build_scene(meshes, instances,
                             [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))],
                             instance_bvh=True)
    assert scene_tree.inst_bvh is not None
    arena = make_arena(cam.generate_rays(), 1)
    fb_scan = trace_image(scene_scan, arena, 32, 32, max_rounds=16)
    fb_tree = trace_image(scene_tree, arena, 32, 32, max_rounds=16)
    np.testing.assert_array_equal(np.asarray(fb_scan), np.asarray(fb_tree))


def test_many_domain_render_tree_plus_domain_sched():
    """128 instances: the scene auto-builds the instance tree (>=64) and
    the domain scheduler runs the tree shuffle under shard_map — the
    PlyReader-many-bricks scenario end-to-end, equal to single-device."""
    import jax
    from jax.sharding import Mesh

    from gravit_tpu.render.scene_build import INSTANCE_BVH_THRESHOLD
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.schedule.domain_sched import DomainRenderer

    meshes = [cube_mesh()]
    instances = []
    for i in range(8):
        for j in range(16):
            instances.append(Instance(
                mesh_id=0,
                m=mat4_translate_scale(
                    (0.0, (i - 3.5) * 0.6, (j - 7.5) * 0.6),
                    (0.25, 0.25, 0.25))))
    assert len(instances) >= INSTANCE_BVH_THRESHOLD
    lights = [point_light((6.0, 2.0, 0.0), (1.0, 1.0, 1.0))]
    cam = PerspectiveCamera(
        eye=(10.0, 0.3, 0.2), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(50 * np.pi / 180), film_width=24, film_height=24,
        samples=1, max_depth=1, jitter_window=0.5)

    scene = build_scene(meshes, instances, lights)
    assert scene.inst_bvh is not None  # auto-built
    arena = make_arena(cam.generate_rays(), 1)
    fb1 = trace_image(scene, arena, 24, 24, max_rounds=16)

    mesh = Mesh(np.array(jax.devices()[:8]), ("domains",))
    dr = DomainRenderer.build(meshes, instances, lights, mesh)
    assert dr.scene_stacked.inst_bvh is not None
    fb2 = dr.render(cam)
    err = np.abs(np.asarray(fb1)[:, :3] - np.asarray(fb2)[:, :3]).max()
    assert err < 1e-5, err
    assert float(np.asarray(fb1)[:, :3].sum()) > 0
