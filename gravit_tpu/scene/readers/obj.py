"""Wavefront OBJ reader.

Reference: data/reader/ObjReader.cpp (tinyobjloader path). Notes for parity:
faces land in the mesh 0-based WITHOUT the degenerate-face filter of
Mesh::addFace (ObjReader.cpp:193-197 pushes Face directly); vertex normals
from the file are normalized; a file without normals gets them from
generateNormals() only if the caller asks (SimpleFileLoadApp.cpp:157 does).
Polygons fan-triangulate like tinyobj.
"""

from __future__ import annotations

import numpy as np

from gravit_tpu.scene.material import Material
from gravit_tpu.scene.mesh import Mesh


def _resolve(idx: int, count: int) -> int:
    """OBJ 1-based w/ negative-relative indices -> 0-based."""
    return idx - 1 if idx > 0 else count + idx


def read_obj(path: str, material_type: int = 0,
             generate_normals: bool = True) -> Mesh:
    verts: list = []
    normals: list = []
    faces: list = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif tag == "vn":
                n = np.array([float(parts[1]), float(parts[2]),
                              float(parts[3])], np.float32)
                nl = np.linalg.norm(n)
                normals.append(n / nl if nl > 0 else n)
            elif tag == "f":
                ids = [_resolve(int(p.split("/")[0]), len(verts))
                       for p in parts[1:]]
                for k in range(1, len(ids) - 1):  # fan triangulation
                    faces.append((ids[0], ids[k], ids[k + 1]))

    mesh = Mesh()
    mesh.add_vertices(np.asarray(verts, np.float32))
    # bypass add_faces: obj faces go in raw (0-based, no degenerate filter)
    mesh.faces = [tuple(int(i) for i in f) for f in faces]
    if len(normals) == len(verts):
        mesh.normals = [np.asarray(n, np.float32) for n in normals]
        mesh.have_normals = True
    mesh.material = Material(type=material_type)
    if generate_normals:
        mesh.generate_normals()
    mesh.compute_bounding_box()
    return mesh
