"""Native (C++) host components vs python fallbacks."""

import time

import numpy as np
import pytest

from gravit_tpu import native
from gravit_tpu.accel.bvh import _build_bvh_py, build_bvh, bvh_intersect_numpy
from gravit_tpu.scene.readers.obj import read_obj


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_bvh_same_hits_as_python():
    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    nat = build_bvh(cm.v0, cm.e1, cm.e2, native=True)
    py = _build_bvh_py(cm.v0, cm.e1, cm.e2)
    assert sorted(nat.order.tolist()) == list(range(cm.num_triangles))

    rng = np.random.default_rng(0)
    o = np.array([0.0, 0.1, 0.3], np.float32)
    center = (cm.bounds_min + cm.bounds_max) / 2
    vn = (cm.v0[nat.order], cm.e1[nat.order], cm.e2[nat.order])
    vp = (cm.v0[py.order], cm.e1[py.order], cm.e2[py.order])
    hits = 0
    for _ in range(60):
        # aim at jittered points around the mesh center
        target = center + rng.normal(scale=0.05, size=3)
        d = (target - o).astype(np.float32)
        d /= np.linalg.norm(d)
        tn, pn, _, _ = bvh_intersect_numpy(nat, *vn, o, d)
        tp, pp, _, _ = bvh_intersect_numpy(py, *vp, o, d)
        if pn >= 0 or pp >= 0:
            hits += 1
            assert int(nat.order[pn]) == int(py.order[pp])
            np.testing.assert_allclose(tn, tp, rtol=1e-5)
    assert hits > 10


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_obj_parse_matches_python():
    verts, faces = native.parse_obj_native(
        "/root/reference/data/geom/bunny.obj")
    m = read_obj("/root/reference/data/geom/bunny.obj",
                 generate_normals=False)
    assert verts.shape == (len(m.vertices), 3)
    assert faces.shape == (len(m.faces), 3)
    np.testing.assert_allclose(verts[0], m.vertices[0])
    np.testing.assert_array_equal(faces, np.asarray(m.faces))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_build_speed():
    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    t0 = time.perf_counter()
    build_bvh(cm.v0, cm.e1, cm.e2, native=True)
    t_native = time.perf_counter() - t0
    assert t_native < 1.0, f"native build too slow: {t_native}s"
