"""Round-5 hardware validation batch (appends JSON lines to
tpu_campaign.log, one subprocess per check so a wedge can be timed out):

  depth2   : bunny 512^2 at camera max_depth=2 — depth-K megapass vs the
             stepped looped tracer ON HARDWARE (the exact surface where
             CPU tests cannot catch MXU-bf16 lowering breakage).
  vol_iso  : wavelet 64^3 with an isovalue — slice-engine iso (hardware
             Mosaic kernel) vs the gather march, image tolerance.
  slabgrid : 64^3 forced into 4-row windows through the slab-GRID kernel
             vs the whole-brick dispatch — bit-level check of the r5
             streaming kernel on hardware.
  areamulti: 5-instance cube row with an area light — fast-multi vs the
             looped tracer byte-compare on hardware (the r5 freeze-round
             RNG seeding).

  nohup python scripts/validate_r5.py [--only NAME] &
"""

import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
LOG = ROOT / "tpu_campaign.log"


def log(rec):
    rec["t"] = time.strftime("%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe_once():
    code = ("import jax.numpy as jnp, numpy as np, time;"
            "s = (time.time_ns() % 97) + 1.0;"
            "x = jnp.full((128,128), s/128.0);"
            "print('ALIVE' if abs(float(np.asarray(x@x)[0,0]) - s*s/128.0)"
            " < 1e-3 else 'BAD')")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=110, text=True)
        return "ALIVE" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


PRE = r"""
import sys
sys.path[:0] = ["%s", "%s/scripts", "%s/tests"]
import json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "%s/.jax_cache")
""" % (ROOT, ROOT, ROOT, ROOT)

CHECK_DEPTH2 = PRE + r"""
from gravit_tpu.render.tracer import (make_arena, trace_image_fast,
                                      trace_image_stepped)
from gravit_tpu.scene import image as img
from parity_bunny import bunny_scene

scene, cam, accel = bunny_scene(with_accel=True, max_depth=2)
rays = cam.generate_rays()
fb_f = np.asarray(trace_image_fast(scene, rays, 512, 512, accel=accel,
                                   max_depth=2))
arena = make_arena(rays, scene.num_lights)
fb_l = np.asarray(trace_image_stepped(scene, arena, 512, 512,
                                      max_rounds=16, accel=accel))
a = img.to_rgb8(fb_f, 512, 512)
b = img.to_rgb8(fb_l, 512, 512)
d2_active = float(np.abs(fb_f - np.asarray(
    trace_image_fast(scene, rays, 512, 512, accel=accel,
                     max_depth=1))).max())
print(json.dumps({"frac": float(img.image_diff(a, b)),
                  "max": int(img.max_byte_error(a, b)),
                  "d2_vs_d1_max": d2_active}))
"""

CHECK_VOL_ISO = PRE + r"""
from gravit_tpu.render.tracer import make_arena
from gravit_tpu.render.volume_scene import build_volume_scene
from gravit_tpu.render.volume_tracer import (can_slice_march, trace_volume,
                                             trace_volume_fast)
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.volume import wavelet_volume

n = 64
vol = wavelet_volume(n)
vol.isovalues = [float(np.asarray(vol.samples).mean())]
scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
c = (n - 1) / 2.0
cam = PerspectiveCamera(
    eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=(c, c, c), up=(0.0, 0.0, 1.0),
    fov=float(30 * np.pi / 180), film_width=512, film_height=512,
    samples=1, max_depth=1, jitter_window=0.0)
rays = cam.generate_rays(volume=True)
ok, axis, flip = can_slice_march(scene, rays.direction)
assert ok
fb_f = np.asarray(trace_volume_fast(scene, rays, 512, 512,
                                    axis=axis, flip=flip))
arena = make_arena(rays, 0)
fb_m = np.asarray(trace_volume(scene, arena, 512, 512, max_rounds=8))
err = np.abs(fb_f[:, :3] - fb_m[:, :3])
print(json.dumps({"mean": float(err.mean()), "max": float(err.max()),
                  "lit": int((fb_f[:, :3].sum(-1) > 0).sum())}))
"""

CHECK_SLABGRID = PRE + r"""
import jax.numpy as jnp
from gravit_tpu.ops.slice_march import slice_march, choose_slice_axis
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.volume import wavelet_volume

n = 64
vol = wavelet_volume(n)
cam = PerspectiveCamera(
    eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
    up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
    film_width=512, film_height=512, samples=1, max_depth=1,
    jitter_window=0.0)
rays = cam.generate_rays(volume=True)
N = rays.origin.shape[0]
axis, flip = choose_slice_axis(np.asarray(rays.direction).mean(0))
meta = dict(axis=axis, flip=flip, step=float(vol.step_size()),
            base_step=float(vol.spacing.min()),
            low=float(vol.tf.low), high=float(vol.tf.high),
            origin=tuple(float(x) for x in vol.origin),
            spacing=tuple(float(x) for x in vol.spacing))
args = (rays.origin, rays.direction, jnp.ones((N,), bool),
        jnp.zeros((N, 3)), jnp.zeros((N,)),
        jnp.asarray(vol.samples), jnp.asarray(vol.tf.color_lut),
        jnp.asarray(vol.tf.opacity_lut))
c_k, w_k, f_k = slice_march(*args, **meta)
c_s, w_s, f_s = slice_march(*args, slab_bytes=256 * 1024, **meta)
print(json.dumps({
    "c_max": float(np.abs(np.asarray(c_s) - np.asarray(c_k)).max()),
    "w_max": float(np.abs(np.asarray(w_s) - np.asarray(w_k)).max()),
    "flags_eq": bool((np.asarray(f_s) == np.asarray(f_k)).all())}))
"""

CHECK_AREAMULTI = PRE + r"""
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.tracer import (make_arena, trace_image_fast_multi,
                                      trace_image_stepped)
from gravit_tpu.scene import image as img
from gravit_tpu.scene.light import area_light, point_light
from test_fast_multi import _cube_row

meshes, scene, cam = _cube_row(
    [area_light((4.0, 4.0, 0.0), (1.0, 0.9, 0.8),
                (-1.0, -1.0, 0.0), 1.5, 1.5),
     point_light((-3.0, 2.0, 1.0), (0.3, 0.3, 0.5))], w=256, h=256)
accel = build_scene_bvh(meshes)
rays = cam.generate_rays()
fb_f = np.asarray(trace_image_fast_multi(scene, rays, 256, 256,
                                         accel=accel))
arena = make_arena(rays, scene.num_lights)
fb_l = np.asarray(trace_image_stepped(scene, arena, 256, 256,
                                      max_rounds=32, accel=accel))
a = img.to_rgb8(fb_f, 256, 256)
b = img.to_rgb8(fb_l, 256, 256)
print(json.dumps({"frac": float(img.image_diff(a, b)),
                  "max": int(img.max_byte_error(a, b))}))
"""

CHECKS = [("validate_depth2_hw", CHECK_DEPTH2),
          ("validate_vol_iso_hw", CHECK_VOL_ISO),
          ("validate_slabgrid_hw", CHECK_SLABGRID),
          ("validate_areamulti_hw", CHECK_AREAMULTI)]


def main():
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    log({"step": "validate_r5_wait"})
    deadline = time.time() + 50 * 60
    while time.time() < deadline:
        if probe_once():
            break
        time.sleep(60)
    else:
        log({"step": "validate_r5", "ok": False,
             "err": "tunnel never recovered within 50 min"})
        return
    for step, code in CHECKS:
        if only and only not in step:
            continue
        t0 = time.time()
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, timeout=1700,
                                 text=True)
            line = ""
            for ln in reversed(out.stdout.strip().splitlines()):
                if ln.startswith("{"):
                    line = ln
                    break
            rec = {"step": step, "s": round(time.time() - t0, 1),
                   "ok": out.returncode == 0}
            if line:
                rec.update(json.loads(line))
            else:
                rec["err"] = (out.stdout + out.stderr)[-300:]
            log(rec)
        except subprocess.TimeoutExpired:
            log({"step": step, "ok": False,
                 "err": "timeout 1700s (compile still in flight?)"})


if __name__ == "__main__":
    main()
