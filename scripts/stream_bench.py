"""Out-of-core streaming vs all-resident on hardware.

Three bunny meshes (69K tris each, ~208K total) under a byte budget that
admits ONE bunny per group: the streamed image scheduler must pay for
double-buffered device_put of each group per round-pick, while the
all-resident render pays nothing. Reports both ms/frame and the streaming
overhead. Closes VERDICT r3 weak #6 ("out-of-core has never faced real
memory pressure") with a measured row for PERF.md.

  python scripts/stream_bench.py [--size 256]
"""

import argparse
import json
import sys
import time
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import os
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 str(ROOT / ".jax_cache")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()
    size = args.size

    from gravit_tpu.accel.scene_accel import build_scene_bvh
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import make_arena, trace_image_stepped
    from gravit_tpu.scene.camera import PerspectiveCamera
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.scene.readers.obj import read_obj
    from gravit_tpu.schedule.image_sched import StreamedImageRenderer

    base = read_obj("/root/reference/data/geom/bunny.obj")
    meshes = [base.compile(), base.compile(), base.compile()]
    instances = [
        Instance(mesh_id=k,
                 m=mat4_translate_scale((0.12 * (k - 1), 0.0, 0.0),
                                        (1.0, 1.0, 1.0)))
        for k in range(3)
    ]
    lights = [point_light((0.0, 0.3, 0.5), (1.0, 1.0, 1.0))]
    cam = PerspectiveCamera(
        eye=(0.0, 0.12, 0.45), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=size, film_height=size,
        samples=1, max_depth=1, jitter_window=0.0)

    per_tri = (StreamedImageRenderer.BYTES_PER_TRI
               + StreamedImageRenderer.BYTES_PER_TRI_ACCEL)
    one_mesh_bytes = meshes[0].num_triangles * per_tri
    budget = int(one_mesh_bytes * 1.2)     # one bunny per group
    sr = StreamedImageRenderer(meshes, instances, lights,
                               budget_bytes=budget, use_accel=True)
    assert sr.num_groups == 3, sr.num_groups

    def timed(fn):
        fb = fn()
        float(np.asarray(fb[:8, :]).sum())
        ts = []
        for _ in range(args.frames):
            t0 = time.time()
            fb = fn()
            float(np.asarray(fb[:8, :]).sum())
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1000, fb

    # streaming evicts+reloads per frame (cold cache per frame = the
    # memory-pressure regime; the 2-slot cache still double-buffers
    # within the frame)
    def stream_frame():
        sr._dev_cache.clear()
        return sr.render(cam, max_rounds=32)

    ms_stream, fb_s = timed(stream_frame)

    scene = build_scene(meshes, instances, lights)
    accel = build_scene_bvh(meshes)

    def resident_frame():
        arena = make_arena(cam.generate_rays(), scene.num_lights)
        return trace_image_stepped(scene, arena, size, size,
                                   max_rounds=32, accel=accel)

    ms_res, fb_r = timed(resident_frame)

    err = float(np.abs(np.asarray(fb_s)[:, :3]
                       - np.asarray(fb_r)[:, :3]).max())
    out = {
        "film": size,
        "groups": sr.num_groups,
        "budget_bytes": budget,
        "total_tris": int(sum(m.num_triangles for m in meshes)),
        "ms_frame_streamed": round(ms_stream, 1),
        "ms_frame_resident": round(ms_res, 1),
        "stream_overhead_x": round(ms_stream / ms_res, 2),
        "max_abs_image_diff": err,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
