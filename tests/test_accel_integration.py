"""Full-frame accel (Pallas interpret) vs brute-force equality on CPU."""

import os

import numpy as np

os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"

import scenes
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.tracer import make_arena, trace_image


def test_accel_frame_matches_brute():
    scene, cam = scenes.simple_scene(16, 16)
    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    accel = build_scene_bvh(meshes)
    arena = make_arena(cam.generate_rays(), 1)
    fb_brute = np.asarray(trace_image(scene, arena, 16, 16, max_rounds=24))
    fb_accel = np.asarray(trace_image(scene, arena, 16, 16, max_rounds=24,
                                      accel=accel))
    err = np.abs(fb_brute - fb_accel).max()
    assert err < 1e-6, f"accel path differs from brute force by {err}"
    assert (fb_accel[:, :3].sum(-1) > 0).sum() > 20
