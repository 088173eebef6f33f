"""Wait for the TPU tunnel to clear, then golden-validate the EXACT
megapass configuration bench_inner --fast measures (tile_order=True
default, dense deposit), full film vs Test/CTESTtest/data/bunny.ppm.
Appends one JSON line to tpu_campaign.log.

  nohup python scripts/validate_fast_golden.py &
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


CHECK = r"""
import sys
sys.path[:0] = ["%s", "%s/scripts", "%s/tests"]
import json
import numpy as np
from gravit_tpu.render.tracer import trace_image_fast
from gravit_tpu.scene import image as img
from parity_bunny import bunny_scene, GOLDEN

scene, cam, accel = bunny_scene(with_accel=True)
rays0 = cam.generate_rays()
fb = trace_image_fast(scene, rays0, 512, 512, accel=accel)
ours = img.to_rgb8(np.asarray(fb), 512, 512)
golden = img.read_ppm(GOLDEN)
print(json.dumps({"frac": float(img.image_diff(ours, golden)),
                  "max": int(img.max_byte_error(ours, golden))}))
""" % (ROOT, ROOT, ROOT)

# full-film simple.ppm through the MULTI-instance megapass + Pallas BVH —
# the hardware golden for trace_image_fast_multi (the bench --simple config)
CHECK_MULTI = r"""
import sys
sys.path[:0] = ["%s", "%s/scripts", "%s/tests"]
import json
import numpy as np
import scenes
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.tracer import trace_image_fast_multi
from gravit_tpu.scene import image as img

scene, cam = scenes.simple_scene(512, 512)
accel = build_scene_bvh([scenes.cone_mesh(), scenes.cube_mesh()])
fb = trace_image_fast_multi(scene, cam.generate_rays(), 512, 512,
                            accel=accel, max_rounds=64)
ours = img.to_rgb8(np.asarray(fb), 512, 512)
golden = img.read_ppm("/root/reference/Test/CTESTtest/data/simple.ppm")
print(json.dumps({"frac": float(img.image_diff(ours, golden)),
                  "max": int(img.max_byte_error(ours, golden))}))
""" % (ROOT, ROOT, ROOT)


def main():
    log({"step": "validate_fast_golden_wait"})
    deadline = time.time() + 50 * 60
    while time.time() < deadline:
        if probe_once():
            break
        time.sleep(60)
    else:
        log({"step": "validate_fast_golden", "ok": False,
             "err": "tunnel never recovered within 50 min"})
        return
    log({"step": "validate_fast_golden_probe_ok"})
    checks = [("validate_fast_golden", CHECK)]
    if "--multi" in sys.argv or "--all" in sys.argv:
        checks.append(("validate_fastmulti_golden", CHECK_MULTI))
    if "--multi" in sys.argv:
        checks = checks[1:]
    for step, code in checks:
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
