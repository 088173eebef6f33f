"""Golden-image parity check: render gvtSimple's embedded scene and compare
against the reference's golden PPM (Test/CTESTtest/data/simple.ppm, produced
by the Embree adapter + image scheduler)."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

from scenes import simple_scene  # noqa: E402
from gravit_tpu.render.tracer import make_arena, trace_image  # noqa: E402
from gravit_tpu.scene import image as img  # noqa: E402

GOLDEN = "/root/reference/Test/CTESTtest/data/simple.ppm"


def main():
    scene, cam = simple_scene(512, 512)
    arena = make_arena(cam.generate_rays(), scene.num_lights)
    t0 = time.time()
    fb = trace_image(scene, arena, 512, 512, max_rounds=64)
    fb.block_until_ready()
    t_first = time.time() - t0
    t0 = time.time()
    fb = trace_image(scene, arena, 512, 512, max_rounds=64)
    fb.block_until_ready()
    t_steady = time.time() - t0
    print(f"first render {t_first:.2f}s  steady {t_steady*1000:.1f}ms")

    ours = img.to_rgb8(np.asarray(fb), 512, 512)
    img.write_ppm("/tmp/ours_simple.ppm", fb, 512, 512)
    golden = img.read_ppm(GOLDEN)
    frac = img.image_diff(ours, golden)
    maxe = img.max_byte_error(ours, golden)
    within2 = np.mean(
        np.abs(ours.astype(np.int32) - golden.astype(np.int32)) <= 2)
    print(f"byte-diff fraction {frac:.5f}  max byte err {maxe}  "
          f"within-2 {within2:.5f}")


if __name__ == "__main__":
    main()
