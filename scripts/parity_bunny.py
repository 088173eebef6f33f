"""Golden-image parity: gvtFileLoad bunny scene vs Test/CTESTtest/data/bunny.ppm.

Scene per SimpleFileLoadApp.cpp:140-265: bunny.obj, default lambert material
(kd=0.5), identity instance, point light (0, 0.1, 0.5) white, camera
eye (0, 0.1, 0.3) -> focus (0, 0.1, -0.3), fov 45deg, 512x512, samples=1,
jitter=0, depth=1.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gravit_tpu.accel.scene_accel import build_scene_bvh  # noqa: E402
from gravit_tpu.render.scene_build import Instance, build_scene  # noqa: E402
from gravit_tpu.render.tracer import make_arena, trace_image  # noqa: E402
from gravit_tpu.scene import image as img  # noqa: E402
from gravit_tpu.scene.camera import PerspectiveCamera  # noqa: E402
from gravit_tpu.scene.light import point_light  # noqa: E402
from gravit_tpu.scene.readers.obj import read_obj  # noqa: E402

GOLDEN = "/root/reference/Test/CTESTtest/data/bunny.ppm"


def bunny_scene(width=512, height=512, with_accel=False, max_depth=1):
    mesh = read_obj("/root/reference/data/geom/bunny.obj")
    cm = mesh.compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    if with_accel:
        accel = build_scene_bvh([cm])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=width, film_height=height,
        samples=1, max_depth=max_depth, jitter_window=0.0)
    if with_accel:
        return scene, cam, accel
    return scene, cam


def main():
    scene, cam = bunny_scene()
    print("tris:", scene.num_triangles)
    arena = make_arena(cam.generate_rays(), scene.num_lights)
    t0 = time.time()
    fb = trace_image(scene, arena, 512, 512, max_rounds=32)
    fb.block_until_ready()
    print(f"first render {time.time()-t0:.2f}s")
    t0 = time.time()
    fb = trace_image(scene, arena, 512, 512, max_rounds=32)
    fb.block_until_ready()
    dt = time.time() - t0
    print(f"steady {dt*1000:.1f} ms  ({512*512/dt/1e6:.1f} Mray/s primary)")

    ours = img.to_rgb8(np.asarray(fb), 512, 512)
    img.write_ppm("/tmp/ours_bunny.ppm", fb, 512, 512)
    golden = img.read_ppm(GOLDEN)
    frac = img.image_diff(ours, golden)
    within2 = np.mean(np.abs(ours.astype(int) - golden.astype(int)) <= 2)
    print(f"byte-diff fraction {frac:.5f}  max err "
          f"{img.max_byte_error(ours, golden)}  within-2 {within2:.5f}")


if __name__ == "__main__":
    main()
