"""Replica-aware domain scheduling: the TVCG'13 replication policies
(LoadAnother/LoadMany/AdaptiveSend) must actually SERVE rays from replicas
end-to-end — a multi-hot residency row changes the measured per-device
load histogram while leaving the image unchanged
(reference capability: schedule/hybrid/LoadAnotherSchedule.h:49-90)."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from gravit_tpu.core.math3d import mat4_translate_scale
from gravit_tpu.render.scene_build import Instance
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.schedule.domain_sched import DomainRenderer, build_routes

from scenes import cube_mesh

N_DEV = 4


def _skewed_scene():
    """One big front-and-center cube (domain 0 gets ~all primary rays) plus
    two small off-axis cubes."""
    meshes = [cube_mesh()]
    instances = [
        Instance(mesh_id=0, m=mat4_translate_scale((0, 0, 0), (1, 1, 1))),
        Instance(mesh_id=0, m=mat4_translate_scale((0, 2.5, 0),
                                                   (0.3, 0.3, 0.3))),
        Instance(mesh_id=0, m=mat4_translate_scale((0, -2.5, 0),
                                                   (0.3, 0.3, 0.3))),
    ]
    lights = [point_light((2.0, 2.0, 2.0), (1.0, 1.0, 1.0))]
    cam = PerspectiveCamera(
        eye=(3.0, 0.2, 0.4), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(40 * np.pi / 180), film_width=24, film_height=24,
        samples=1, max_depth=1, jitter_window=0.5)
    return meshes, instances, lights, cam


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("domains",))


def test_build_routes():
    res = np.array([[1, 0, 1, 0], [0, 1, 0, 0]], bool)
    route, n_rep = build_routes(res)
    assert n_rep.tolist() == [2, 1]
    assert route[0].tolist() == [0, 2, 0, 2]
    assert route[1].tolist() == [1, 1, 1, 1]


@pytest.mark.parametrize("policy", ["LoadAnother", "LoadMany",
                                    "AdaptiveSend"])
def test_replication_spreads_load_image_unchanged(policy):
    meshes, instances, lights, cam = _skewed_scene()
    owners = np.array([0, 1, 2], np.int32)
    dr1 = DomainRenderer.build(meshes, instances, lights, _mesh(),
                               owners=owners)
    fb1, load1 = dr1.render(cam, return_load=True)
    load1 = np.asarray(load1)

    pending = dr1.pending_histogram(cam)
    assert int(np.argmax(pending)) == 0  # the scene is skewed as intended

    dr2 = dr1.reschedule(pending, policy)
    # the policy must have replicated the hot domain onto >1 device
    assert dr2.resident[0].sum() >= 2, dr2.resident
    fb2, load2 = dr2.render(cam, return_load=True)
    load2 = np.asarray(load2)

    # image identical: every ray still traced exactly once
    np.testing.assert_array_equal(np.asarray(fb1)[:, :3],
                                  np.asarray(fb2)[:, :3])
    # the hot device's measured queue load drops: replicas serve real rays
    assert load2.max() < load1.max(), (load1, load2)
    # and the formerly-idle replica device now traces rays
    gained = set(np.nonzero(dr2.resident[0])[0]) - {0}
    assert any(load2[d] > load1[d] for d in gained), (load1, load2)


def test_one_hot_residency_matches_owner_path():
    """resident=None (owners path) and explicit one-hot residency are the
    same scheduler."""
    meshes, instances, lights, cam = _skewed_scene()
    owners = np.array([0, 1, 2], np.int32)
    dr1 = DomainRenderer.build(meshes, instances, lights, _mesh(),
                               owners=owners)
    res = np.zeros((3, N_DEV), bool)
    res[np.arange(3), owners] = True
    dr2 = DomainRenderer.build(meshes, instances, lights, _mesh(),
                               resident=res)
    fb1 = dr1.render(cam)
    fb2 = dr2.render(cam)
    np.testing.assert_array_equal(np.asarray(fb1), np.asarray(fb2))
