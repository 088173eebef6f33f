"""Tessellation (qhull replacement): convex hull + 2.5D Delaunay."""

import numpy as np

from gravit_tpu.scene.tessellate import convex_hull, delaunay_2_5d


def test_convex_hull_cube():
    pts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                    for z in (0, 1)] + [[0.5, 0.5, 0.5]], np.float64)
    tris = convex_hull(pts)
    # cube hull = 12 triangles, interior point excluded
    assert len(tris) == 12
    assert all(8 not in t for t in tris)
    # all normals point outward from the centroid
    c = pts[:8].mean(axis=0)
    for a, b, d in tris:
        n = np.cross(pts[b] - pts[a], pts[d] - pts[a])
        assert n @ (pts[a] - c) > 0


def test_convex_hull_sphere_closed():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(80, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    tris = convex_hull(p)
    # closed 2-manifold: every edge shared by exactly 2 triangles,
    # Euler characteristic V - E + F = 2
    edges = {}
    verts = set()
    for t in tris:
        verts.update(t)
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            edges[k] = edges.get(k, 0) + 1
    assert all(v == 2 for v in edges.values())
    assert len(verts) - len(edges) + len(tris) == 2


def test_delaunay_grid():
    xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
    pts = np.stack([xs.ravel(), ys.ravel(),
                    0.1 * xs.ravel() * ys.ravel()], axis=1)
    tris = delaunay_2_5d(pts)
    # a 4x4 grid triangulates into 2*(3*3) = 18 triangles
    assert len(tris) == 18
    # every input point used
    used = set()
    for t in tris:
        used.update(t)
    assert used == set(range(16))


def test_api_tessellate():
    from gravit_tpu import api

    api.gvtInit()
    api.createMesh("cloud")
    pts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                    for z in (0, 1)], np.float32)
    api.addMeshVertices("cloud", 8, pts.ravel(), tessellate=True,
                        qhullargs="hull")
    api.finishMesh("cloud")
    m = api._db().find("cloud")["ptr"]
    assert len(m.faces) == 12
