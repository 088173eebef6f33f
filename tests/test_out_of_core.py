"""Out-of-core image scheduling: a scene whose total triangle count
exceeds the per-device budget renders by streaming mesh groups
(ImageTracer.h:184-233 adapter-cache analog) and matches the all-resident
tracer bit-for-bit on RNG-free configs."""

import numpy as np
import pytest

from gravit_tpu.core.math3d import mat4_translate_scale
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.render.tracer import make_arena, trace_image
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.schedule.image_sched import StreamedImageRenderer

from scenes import cone_mesh, cube_mesh


def _scene():
    meshes = [cone_mesh(), cube_mesh(), cone_mesh(), cube_mesh()]
    instances = []
    k = 0
    for i in range(-1, 2):
        for j in range(-1, 2):
            instances.append(Instance(
                mesh_id=k % 4,
                m=mat4_translate_scale((0.0, i * 0.7, j * 0.7),
                                       (0.45, 0.45, 0.45))))
            k += 1
    lights = [point_light((3.0, 1.0, -1.0), (1.0, 1.0, 1.0))]
    cam = PerspectiveCamera(
        eye=(4.0, 0.0, 0.0), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(45 * np.pi / 180), film_width=24, film_height=24,
        samples=1, max_depth=1, jitter_window=0.5)
    return meshes, instances, lights, cam


def test_streamed_matches_resident():
    meshes, instances, lights, cam = _scene()
    total = sum(m.num_triangles for m in meshes)
    budget = 12  # fits only one cube OR two cones; total is 36
    assert budget < total

    sr = StreamedImageRenderer(meshes, instances, lights, budget)
    assert sr.num_groups >= 3  # genuinely streamed in several loads
    fb_stream = sr.render(cam)

    scene = build_scene(meshes, instances, lights)
    arena = make_arena(cam.generate_rays(), scene.num_lights)
    fb_full = trace_image(scene, arena, 24, 24, max_rounds=16)
    np.testing.assert_array_equal(np.asarray(fb_full)[:, :3],
                                  np.asarray(fb_stream)[:, :3])
    assert float(np.asarray(fb_stream)[:, :3].sum()) > 0


def test_budget_below_largest_mesh_rejected():
    meshes, instances, lights, cam = _scene()
    with pytest.raises(ValueError):
        StreamedImageRenderer(meshes, instances, lights, 4)


def test_streamed_budget_bytes_and_accel():
    """Byte budgets resolve to the same grouping as their triangle
    equivalent, and the Pallas accel (interpret) streams per-group with
    identical output."""
    import os

    meshes, instances, lights, cam = _scene()
    bpt = StreamedImageRenderer.BYTES_PER_TRI
    sr_b = StreamedImageRenderer(meshes, instances, lights,
                                 budget_bytes=12 * bpt)
    assert sr_b.num_groups >= 3
    fb_bytes = sr_b.render(cam)

    scene = build_scene(meshes, instances, lights)
    arena = make_arena(cam.generate_rays(), scene.num_lights)
    fb_full = trace_image(scene, arena, 24, 24, max_rounds=16)
    np.testing.assert_array_equal(np.asarray(fb_full)[:, :3],
                                  np.asarray(fb_bytes)[:, :3])

    _prev = os.environ.get("GRAVIT_PALLAS_INTERPRET")
    os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"
    try:
        sr_a = StreamedImageRenderer(
            meshes, instances, lights,
            budget_bytes=12 * (StreamedImageRenderer.BYTES_PER_TRI
                               + StreamedImageRenderer.BYTES_PER_TRI_ACCEL),
            use_accel=True)
        assert sr_a.num_groups >= 3
        fb_accel = sr_a.render(cam)
        # accel vs brute carries the known ulp-level kernel fma-order
        # skew (verify recipe: max |d| ~1.8e-7); not a streaming effect
        np.testing.assert_allclose(np.asarray(fb_full)[:, :3],
                                   np.asarray(fb_accel)[:, :3], atol=1e-6)
    finally:
        if _prev is None:
            os.environ.pop("GRAVIT_PALLAS_INTERPRET", None)
        else:
            os.environ["GRAVIT_PALLAS_INTERPRET"] = _prev
