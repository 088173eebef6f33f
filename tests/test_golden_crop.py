"""Golden-image parity IN CI for the accel path.

scripts/parity_{simple,bunny}.py verify full 512x512 byte-parity but need a
healthy TPU and a human; this test keeps the accel path pinned to the
reference golden (Test/CTESTtest/data/bunny.ppm) at CPU-affordable cost by
rendering only a 64x64 film crop under GRAVIT_PALLAS_INTERPRET=1 and
byte-comparing that region (tolerance semantics: ImageDiff.cpp exact-byte).
Any tracer-epsilon regression (RAY_EPSILON bumps, shadow t quirk, shading
constants) flips bytes here and fails.
"""

import os
import pathlib

import numpy as np
import pytest

from gravit_tpu.scene import image as img

GOLDEN = "/root/reference/Test/CTESTtest/data/bunny.ppm"
BUNNY = "/root/reference/data/geom/bunny.obj"

# crop covering bunny body + shadowed region + silhouette edge
ROW0, COL0, CROP = 224, 224, 64


@pytest.mark.skipif(not pathlib.Path(GOLDEN).exists(),
                    reason="reference goldens not present")
def test_bunny_crop_byte_parity_accel():
    _prev = os.environ.get("GRAVIT_PALLAS_INTERPRET")
    os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"
    try:
        import jax
        import jax.numpy as jnp

        from gravit_tpu.accel.scene_accel import build_scene_bvh
        from gravit_tpu.render.scene_build import Instance, build_scene
        from gravit_tpu.render.tracer import trace_image_fast
        from gravit_tpu.scene.camera import PerspectiveCamera
        from gravit_tpu.scene.light import point_light
        from gravit_tpu.scene.readers.obj import read_obj

        W = H = 512
        cm = read_obj(BUNNY).compile()
        scene = build_scene(
            [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
            [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
        accel = build_scene_bvh([cm])
        cam = PerspectiveCamera(
            eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
            fov=float(45.0 * np.pi / 180.0), film_width=W, film_height=H,
            samples=1, max_depth=1, jitter_window=0.0)

        rays = cam.generate_rays()
        # keep only the crop's lanes: pixel id = row*W + col
        row = rays.id // W
        col = rays.id % W
        in_crop = np.asarray((row >= ROW0) & (row < ROW0 + CROP)
                             & (col >= COL0) & (col < COL0 + CROP))
        lanes = np.nonzero(in_crop)[0]
        assert lanes.size == CROP * CROP
        rays = jax.tree.map(lambda a: a[jnp.asarray(lanes)], rays)

        # crop lanes carry full-film pixel ids (lane != pixel), so the
        # dense-deposit fast path must be off — this is the general
        # subwindow form
        fb = trace_image_fast(scene, rays, W, H, accel=accel,
                              dense_deposit=False)
        ours = img.to_rgb8(np.asarray(fb), W, H)
        golden = img.read_ppm(GOLDEN)
        # to_rgb8 flips bottom-to-top: film row r lands at image row H-1-r
        sl = slice(H - ROW0 - CROP, H - ROW0)
        ours_c = ours[sl, COL0:COL0 + CROP]
        gold_c = golden[sl, COL0:COL0 + CROP]
        # the crop must show real content, not background
        assert gold_c.astype(np.int32).sum() > 0
        max_err = img.max_byte_error(ours_c, gold_c)
        frac = img.image_diff(ours_c, gold_c)
        # full-film parity is byte-exact on TPU; tolerate the known max-1
        # rounding skew (BASELINE.md round-1: max 1 byte on 0.002% of bytes)
        assert max_err <= 1, f"crop max byte err {max_err}, frac {frac}"
        assert frac < 0.001, f"crop byte-diff fraction {frac}"
    finally:
        if _prev is None:
            os.environ.pop("GRAVIT_PALLAS_INTERPRET", None)
        else:
            os.environ["GRAVIT_PALLAS_INTERPRET"] = _prev


GOLDEN_SIMPLE = "/root/reference/Test/CTESTtest/data/simple.ppm"


@pytest.mark.skipif(not pathlib.Path(GOLDEN_SIMPLE).exists(),
                    reason="reference goldens not present")
def test_simple_crop_byte_parity_looped_accel():
    """Multi-instance golden through the LOOPED accel path (closes
    VERDICT r3 weak #8): a 64x64 crop of the 25-instance SimpleApp scene
    traced by trace_image + Pallas-interpret BVH, byte-compared to the
    reference simple.ppm. Pins the multi-instance shuffle, the
    segment-aligned (mesh, shadow) dispatch, and the spawn/append
    machinery — an epsilon regression confined to any of those flips
    bytes here."""
    _prev = os.environ.get("GRAVIT_PALLAS_INTERPRET")
    os.environ["GRAVIT_PALLAS_INTERPRET"] = "1"
    try:
        import sys

        import jax
        import jax.numpy as jnp

        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        import scenes

        from gravit_tpu.accel.scene_accel import build_scene_bvh
        from gravit_tpu.render.tracer import make_arena, trace_image

        W = H = 512
        scene, cam = scenes.simple_scene(W, H)
        accel = build_scene_bvh([scenes.cone_mesh(), scenes.cube_mesh()])
        rays = cam.generate_rays()
        row = rays.id // W
        col = rays.id % W
        # crop over the central instances (objects + inter-instance
        # shadows, not background)
        r0 = c0 = 224
        in_crop = np.asarray((row >= r0) & (row < r0 + CROP)
                             & (col >= c0) & (col < c0 + CROP))
        lanes = np.nonzero(in_crop)[0]
        rays = jax.tree.map(lambda a: a[jnp.asarray(lanes)], rays)
        arena = make_arena(rays, scene.num_lights)
        # grazing rays can hop >32 instances (scripts/parity_simple.py)
        fb = trace_image(scene, arena, W, H, max_rounds=64, accel=accel)
        ours = img.to_rgb8(np.asarray(fb), W, H)
        golden = img.read_ppm(GOLDEN_SIMPLE)
        sl = slice(H - r0 - CROP, H - r0)
        ours_c = ours[sl, c0:c0 + CROP]
        gold_c = golden[sl, c0:c0 + CROP]
        assert gold_c.astype(np.int32).sum() > 0
        max_err = img.max_byte_error(ours_c, gold_c)
        frac = img.image_diff(ours_c, gold_c)
        # byte-exact on TPU (parity_simple); CPU fma contraction may round
        # one byte one step off (regression_matrix simple_golden note)
        assert max_err <= 1, f"crop max byte err {max_err}, frac {frac}"
        assert frac < 0.001, f"crop byte-diff fraction {frac}"
    finally:
        if _prev is None:
            os.environ.pop("GRAVIT_PALLAS_INTERPRET", None)
        else:
            os.environ["GRAVIT_PALLAS_INTERPRET"] = _prev
