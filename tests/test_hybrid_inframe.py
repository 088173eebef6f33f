"""In-frame hybrid remap (HybridTracer.h:223-299 analog): a deliberately
bad initial placement (every domain on device 0) must be fixed MID-FRAME —
the per-chunk histogram triggers a policy re-placement, the same frame
resumes, the hot device's measured load drops >=1.5x, and the image is
unchanged."""

import numpy as np
import jax
from jax.sharding import Mesh

from gravit_tpu.core.math3d import mat4_translate_scale
from gravit_tpu.render.scene_build import Instance
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.schedule.domain_sched import DomainRenderer

from scenes import cube_mesh

N_DEV = 8


def _scene():
    """Row of cubes with Russian-roulette bounces (max_depth=3): secondary
    rays wander between instances for several rounds after round 1, so the
    bulk of the frame's ray-rounds is in-frame work a mid-frame remap can
    rebalance. The counter-based RNG (core/rng.py) makes bounce directions
    placement-invariant, so images stay bit-identical across schedules."""
    meshes = [cube_mesh()]
    zs = (-2.5, -1.5, -0.5, 0.5, 1.5, 2.5)
    instances = [
        Instance(mesh_id=0, m=mat4_translate_scale((0.0, 0.0, z),
                                                   (0.45, 0.45, 0.45)))
        for z in zs
    ]
    lights = [point_light((4.0, 4.0, 0.0), (1.0, 1.0, 1.0))]
    cam = PerspectiveCamera(
        eye=(4.5, 0.3, 0.0), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(55 * np.pi / 180), film_width=24, film_height=24,
        samples=1, max_depth=3, jitter_window=0.5)
    return meshes, instances, lights, cam


def test_inframe_remap_balances_and_preserves_image():
    meshes, instances, lights, cam = _scene()
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("domains",))
    bad_owners = np.zeros((len(instances),), np.int32)  # all on device 0

    dr = DomainRenderer.build(meshes, instances, lights, mesh,
                              owners=bad_owners)
    fb_static, load_static = dr.render(cam, return_load=True)
    load_static = np.asarray(load_static, np.int64)
    assert load_static[1:].sum() == 0  # static: device 0 does everything

    fb_hybrid, load_hybrid = dr.render_hybrid(
        cam, chunk=1, tau=1.5, policy="RayWeightedSpread",
        return_load=True)
    load_hybrid = np.asarray(load_hybrid, np.int64)

    np.testing.assert_array_equal(np.asarray(fb_static)[:, :3],
                                  np.asarray(fb_hybrid)[:, :3])
    # the remap must have moved real work off the hot device mid-frame
    assert load_hybrid.max() * 1.5 <= load_static.max(), (
        load_static, load_hybrid)
    assert (load_hybrid[1:] > 0).any()


def test_inframe_overflow_regrows_not_raises():
    """A deliberately tiny exchange_cap must NOT abort the frame: the
    overflowing chunk is rewound and replayed with the observed peak
    per-destination demand (the same predictive regrow render() has), and
    the finished image is bit-identical to an uncapped render."""
    meshes, instances, lights, cam = _scene()
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("domains",))
    good = np.arange(len(instances), dtype=np.int32) % N_DEV
    dr = DomainRenderer.build(meshes, instances, lights, mesh, owners=good)
    fb_plain = dr.render(cam)
    # cap=1: essentially every migrating ray overflows on the first chunk
    fb_tiny = dr.render_hybrid(cam, chunk=2, tau=4.0, exchange_cap=1)
    np.testing.assert_array_equal(np.asarray(fb_plain)[:, :3],
                                  np.asarray(fb_tiny)[:, :3])


def test_inframe_remap_noop_when_balanced():
    """A well-placed scene must not be perturbed (remap is conditional)."""
    meshes, instances, lights, cam = _scene()
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("domains",))
    good = np.arange(len(instances), dtype=np.int32) % N_DEV
    dr = DomainRenderer.build(meshes, instances, lights, mesh, owners=good)
    fb_plain = dr.render(cam)
    fb_hybrid = dr.render_hybrid(cam, chunk=2, tau=4.0)
    np.testing.assert_array_equal(np.asarray(fb_plain)[:, :3],
                                  np.asarray(fb_hybrid)[:, :3])
