"""Shared test scenes. `simple_scene()` replicates gvtSimple's embedded
cone+cube grid (apps/render/SimpleApp.cpp:83-186) for golden-image parity."""

from __future__ import annotations

import numpy as np

from gravit_tpu.core.math3d import mat4_translate_scale
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.scene.material import Material
from gravit_tpu.scene.mesh import Mesh

CONE_VERTS = [
    0.5, 0.0, 0.0, -0.5, 0.5, 0.0, -0.5, 0.25, 0.433013, -0.5, -0.25,
    0.43013, -0.5, -0.5, 0.0, -0.5, -0.25, -0.433013, -0.5, 0.25, -0.433013,
]
CONE_FACES = [1, 2, 3, 1, 3, 4, 1, 4, 5, 1, 5, 6, 1, 6, 7, 1, 7, 2]

CUBE_VERTS = [
    -0.5, -0.5, 0.5, 0.5, -0.5, 0.5, 0.5, 0.5, 0.5, -0.5, 0.5, 0.5,
    -0.5, -0.5, -0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5, -0.5,
    0.5, 0.5, 0.5, -0.5, 0.5, 0.5, 0.5, 0.5, -0.5, -0.5, 0.5, -0.5,
    -0.5, -0.5, 0.5, 0.5, -0.5, 0.5, -0.5, -0.5, -0.5, 0.5, -0.5, -0.5,
    0.5, -0.5, 0.5, 0.5, 0.5, 0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5,
    -0.5, -0.5, 0.5, -0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5, 0.5, -0.5,
]
CUBE_FACES = [
    1, 2, 3, 1, 3, 4, 17, 19, 20, 17, 20, 18, 6, 5, 8, 6, 8, 7,
    23, 21, 22, 23, 22, 24, 10, 9, 11, 10, 11, 12, 13, 15, 16, 13, 16, 14,
]


def cone_mesh():
    m = Mesh()
    m.add_vertices(np.asarray(CONE_VERTS))
    m.add_faces(np.asarray(CONE_FACES))
    m.material = Material(kd=(1.0, 1.0, 1.0))
    return m.finish()


def cube_mesh():
    m = Mesh()
    m.add_vertices(np.asarray(CUBE_VERTS))
    m.add_faces(np.asarray(CUBE_FACES))
    m.material = Material(kd=(1.0, 1.0, 1.0))
    return m.finish()


def simple_scene(width: int = 512, height: int = 512):
    """5x5 grid of alternating cones/cubes (SimpleApp.cpp:164-186)."""
    meshes = [cone_mesh(), cube_mesh()]
    instances = []
    inst_id = 0
    for i in range(-2, 3):
        for j in range(-2, 3):
            m = mat4_translate_scale((0.0, i * 0.5, j * 0.5), (0.4, 0.4, 0.4))
            instances.append(Instance(mesh_id=inst_id % 2, m=m))
            inst_id += 1
    lights = [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))]
    scene = build_scene(meshes, instances, lights)
    camera = PerspectiveCamera(
        eye=(4.0, 0.0, 0.0), focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=width, film_height=height,
        samples=1, max_depth=1, jitter_window=0.5, jitter_mode="golden",
    )
    return scene, camera
