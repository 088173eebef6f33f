"""Domain scheduler: 8-device ray migration must reproduce the single-device
image exactly (the reference's only multi-rank oracle is 'run under mpirun
and diff the image', CMakeLists.txt:680-682 — same idea, virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import scenes
from gravit_tpu.render.tracer import make_arena, trace_image
from gravit_tpu.schedule.domain_sched import (DomainRenderer,
                                              partition_scene,
                                              round_robin_owners)


@pytest.fixture(scope="module")
def simple():
    return scenes.simple_scene(32, 32)


def test_round_robin_owners():
    np.testing.assert_array_equal(round_robin_owners(5, 2), [0, 1, 0, 1, 0])


def test_partition_scene_shapes(simple):
    scene, cam = simple
    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.scene_build import Instance
    from gravit_tpu.scene.light import point_light
    instances = []
    k = 0
    for i in range(-2, 3):
        for j in range(-2, 3):
            instances.append(Instance(
                mesh_id=k % 2,
                m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                       (0.4, 0.4, 0.4))))
            k += 1
    lights = [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))]
    stacked, owners = partition_scene(meshes, instances, lights, 4)
    assert stacked.tri_v0.shape[0] == 4          # device axis
    assert owners.shape == (25,)
    # foreign instances have mesh -1 on each device
    im = np.asarray(stacked.inst_mesh)
    for d in range(4):
        np.testing.assert_array_equal(im[d] >= 0, np.asarray(owners) == d)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_domain_scheduler_matches_single_device(n_dev):
    scene, cam = scenes.simple_scene(32, 32)
    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.scene_build import Instance
    from gravit_tpu.scene.light import point_light
    instances = []
    k = 0
    for i in range(-2, 3):
        for j in range(-2, 3):
            instances.append(Instance(
                mesh_id=k % 2,
                m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                       (0.4, 0.4, 0.4))))
            k += 1
    lights = [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))]

    # single-device reference
    arena = make_arena(cam.generate_rays(), 1)
    fb_ref = np.asarray(trace_image(scene, arena, 32, 32, max_rounds=32))

    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs.reshape(n_dev), ("domains",))
    dr = DomainRenderer.build(meshes, instances, lights, mesh)
    fb_dom = np.asarray(dr.render(cam, max_rounds=32))

    err = np.abs(fb_ref[:, :3] - fb_dom[:, :3]).max()
    assert err < 1e-5, f"domain-scheduled image differs by {err}"
    assert (fb_dom[:, :3].sum(-1) > 0).sum() > 50


def test_hybrid_2d_mesh_domains_x_rays():
    """2D mesh: domains sharded on one axis, rays data-parallel on the
    other — the full DP x MP composition."""
    import jax.numpy as jnp
    from gravit_tpu.schedule.domain_sched import partition_scene, trace_domain
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.scene_build import Instance
    from gravit_tpu.scene.light import point_light

    scene, cam = scenes.simple_scene(32, 32)
    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    instances = []
    k = 0
    for i in range(-2, 3):
        for j in range(-2, 3):
            instances.append(Instance(
                mesh_id=k % 2,
                m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                       (0.4, 0.4, 0.4))))
            k += 1
    lights = [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))]

    arena = make_arena(cam.generate_rays(), 1)
    fb_ref = np.asarray(trace_image(scene, arena, 32, 32, max_rounds=32))

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("domains", "rays"))
    stacked, owners = partition_scene(meshes, instances, lights, 2)
    if arena.capacity % 4:
        pad = 4 - arena.capacity % 4
        arena = jax.tree.map(lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), arena)
    fb = np.asarray(trace_domain(stacked, owners, arena, 32, 32, mesh,
                                 axis="domains", ray_axis="rays",
                                 max_rounds=32))
    err = np.abs(fb_ref[:, :3] - fb[:, :3]).max()
    assert err < 1e-5, f"2D hybrid sharding changed image by {err}"


def test_depth3_area_light_sharding_invariant():
    """RR bounces + area-light sampling give IDENTICAL images under any
    sharding (counter-based RNG) — impossible in the reference, where
    samples depend on the TBB chunk layout."""
    import jax.numpy as jnp
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import area_light

    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    instances = []
    k = 0
    for i in range(-1, 2):
        for j in range(-1, 2):
            instances.append(Instance(
                mesh_id=k % 2,
                m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                       (0.4, 0.4, 0.4))))
            k += 1
    lights = [area_light((1.0, 0.5, -1.0), (1.0, 1.0, 1.0),
                         (0.0, 1.0, 0.0), 0.4, 0.4)]
    scene = build_scene(meshes, instances, lights)
    cam = PerspectiveCamera(
        eye=(4.0, 0.0, 0.0), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(45 * np.pi / 180), film_width=24, film_height=24,
        samples=2, max_depth=3, jitter_window=0.5)
    arena = make_arena(cam.generate_rays(), 1)
    fb1 = np.asarray(trace_image(scene, arena, 24, 24, max_rounds=48))
    assert np.isfinite(fb1).all()
    assert fb1[:, :3].max() <= 1.0 + 1e-6
    assert (fb1[:, :3].sum(-1) > 0).sum() > 30

    # image-scheduler sharding must reproduce the exact image
    from jax.sharding import Mesh as JMesh
    from gravit_tpu.schedule.image_sched import trace_image_sharded
    devs = np.array(jax.devices()[:8]).reshape(8)
    jmesh = JMesh(devs, ("rays",))
    cap = arena.capacity
    if cap % 8:
        pad = 8 - cap % 8
        arena = jax.tree.map(lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), arena)
    fb8 = np.asarray(trace_image_sharded(scene, arena, 24, 24, jmesh,
                                         max_rounds=48))
    assert np.abs(fb1 - fb8).max() < 1e-6
