"""Staged TPU measurement campaign for a fragile terminal.

Runs the smallest-possible experiments first, health-probes between every
step, and appends one JSON line per step to tpu_campaign.log — so a wedge
mid-campaign still leaves every number captured up to that point, plus the
exact step that triggered it (the round-2 VERDICT asks for this bisection).

  python scripts/tpu_campaign.py [--soak N]
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
LOG = ROOT / "tpu_campaign.log"
# Persistent compile cache: if the axon PJRT plugin supports executable
# serialization, later identical programs (incl. the driver's bench.py)
# skip the 300-600 s remote compile entirely.
ENV = dict(os.environ, JAX_COMPILATION_CACHE_DIR=str(ROOT / ".jax_cache"))


def log(rec):
    rec["t"] = time.strftime("%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_py(tag, code, timeout):
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", code], env=ENV,
                             capture_output=True, timeout=timeout, text=True)
        line = ""
        for ln in reversed(out.stdout.strip().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        rec = {"step": tag, "s": round(time.time() - t0, 1),
               "ok": out.returncode == 0}
        if line:
            rec.update(json.loads(line))
        elif out.returncode != 0:
            rec["err"] = (out.stdout + out.stderr)[-300:]
        log(rec)
        return rec["ok"]
    except subprocess.TimeoutExpired:
        log({"step": tag, "s": round(time.time() - t0, 1), "ok": False,
             "err": f"timeout {timeout}s"})
        return False


def probe(tag="probe"):
    # time-salted input defeats the axon memoization cache
    return run_py(tag, (
        "import jax.numpy as jnp, numpy as np, json, time;"
        "s = (time.time_ns() % 97) + 1.0;"
        "x = jnp.full((128,128), s/128.0);"
        "print(json.dumps({'alive': "
        "abs(float(np.asarray(x@x)[0,0]) - s*s/128.0) < 1e-3}))"
    ), 100)


PRELUDE = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, "%s")
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.scene_build import Instance, build_scene
from gravit_tpu.render.tracer import (make_arena, trace_image,
                                      trace_image_fast, trace_image_stepped)
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.light import point_light
from gravit_tpu.scene.readers.obj import read_obj

def bunny(W):
    cm = read_obj("/root/reference/data/geom/bunny.obj").compile()
    scene = build_scene(
        [cm], [Instance(mesh_id=0, m=np.eye(4, dtype=np.float32))],
        [point_light((0.0, 0.1, 0.5), (1.0, 1.0, 1.0))])
    accel = build_scene_bvh([cm])
    cam = PerspectiveCamera(
        eye=(0.0, 0.1, 0.3), focus=(0.0, 0.1, -0.3), up=(0.0, 1.0, 0.0),
        fov=float(45.0 * np.pi / 180.0), film_width=W, film_height=W,
        samples=1, max_depth=1, jitter_window=0.0)
    return scene, accel, cam

def timed(frame, n_rays, warm=1, frames=3):
    for i in range(warm):
        float(np.asarray(frame(1000 + i)[:8, :]).sum())
    ts = []
    for i in range(frames):
        t0 = time.time()
        float(np.asarray(frame(i)[:8, :]).sum())
        ts.append(time.time() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    print(json.dumps({"ms_per_frame": round(dt * 1e3, 1),
                      "rays_per_s": round(n_rays / dt)}))
""" % ROOT


FAST512 = PRELUDE + r"""
scene, accel, cam = bunny(512)
rays0 = cam.generate_rays()
def frame(i):
    rays = rays0.replace(origin=rays0.origin + 1.7e-6 * (i + 1))
    return trace_image_fast(scene, rays, 512, 512, accel=accel)
timed(frame, 512 * 512)
"""

VOLUME512 = PRELUDE + r"""
from gravit_tpu.render.volume_scene import build_volume_scene
from gravit_tpu.render.volume_tracer import trace_volume
from gravit_tpu.scene.volume import wavelet_volume
n = 64
vol = wavelet_volume(n)
vscene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
c = (n - 1) / 2.0
vcam = PerspectiveCamera(
    eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=(c, c, c), up=(0.0, 0.0, 1.0),
    fov=float(30 * np.pi / 180), film_width=512, film_height=512,
    samples=1, max_depth=1, jitter_window=0.0)
rays0 = vcam.generate_rays(volume=True)
arena0 = make_arena(rays0, 0)
def frame(i):
    arena = arena0.replace(origin=arena0.origin + 1.7e-4 * (i + 1))
    return trace_volume(vscene, arena, 512, 512, max_rounds=16)
timed(frame, 512 * 512)
"""


def soak_code(n):
    return PRELUDE + r"""
scene, accel, cam = bunny(512)
rays0 = cam.generate_rays()
times = []
for i in range(%d):
    t0 = time.time()
    rays = rays0.replace(origin=rays0.origin + 1.9e-6 * (i + 1))
    fb = trace_image_fast(scene, rays, 512, 512, accel=accel)
    float(np.asarray(fb[:8, :]).sum())
    times.append(time.time() - t0)
print(json.dumps({"frames": len(times),
                  "ms_min": round(min(times) * 1e3, 1),
                  "ms_med": round(sorted(times)[len(times)//2] * 1e3, 1),
                  "ms_max": round(max(times) * 1e3, 1)}))
""" % n


def headline(soak_n):
    """Headline-first plan for a fresh tunnel: spend the clean compile slot
    on the numbers that matter, with windows patient enough that no
    in-flight compile is ever killed (the wedge trigger, SESSION_NOTES)."""
    log({"step": "headline_start"})
    if not probe("probe0"):
        log({"step": "abort", "why": "wedged at start"})
        return
    ok = run_py("fast512", FAST512, 2700)
    probe("probe1")
    if ok:
        # fresh process, same program: measures compile-cache warmth for
        # the driver's own bench.py run
        run_py("fast512_repeat", FAST512, 1200)
        probe("probe1b")
    run_py("volume512", VOLUME512, 1800)
    probe("probe2")
    if soak_n:
        run_py("soak%d" % soak_n, soak_code(soak_n), 1200 + 30 * soak_n)
        probe("probe_soak")
    log({"step": "headline_done"})


def main():
    soak_n = 0
    if "--soak" in sys.argv:
        soak_n = int(sys.argv[sys.argv.index("--soak") + 1])
    if "--headline" in sys.argv:
        headline(soak_n)
        return
    log({"step": "campaign_start"})
    if not probe("probe0"):
        log({"step": "abort", "why": "wedged at start"})
        return

    # 1. standalone kernel: 64K incoherent rays, closest-hit only
    ok = run_py("kernel64k", PRELUDE + r"""
import jax.numpy as jnp
scene, accel, cam = bunny(256)
rng = np.random.default_rng(0)
n = 65536
o = jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32))
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
d = jnp.asarray(d)
valid = jnp.ones((n,), jnp.int32)
from gravit_tpu.ops.pallas_bvh import PACKET, bvh_intersect
root = jnp.full((n // PACKET,), int(accel.mesh_root[0]), jnp.int32)
def frame(i):
    t, p, u, v = bvh_intersect(o + 1e-6 * (i + 1), d, valid, root,
                               accel.bounds, accel.meta, accel.tri)
    return t.reshape(-1, 1)
timed(frame, n)
""", 420)
    if not probe("probe1") or not ok:
        log({"step": "abort", "why": "kernel64k wedged/failed"})
        return

    # 2. fast megapass at 128 film
    ok = run_py("fast128", PRELUDE + r"""
scene, accel, cam = bunny(128)
rays0 = cam.generate_rays()
def frame(i):
    rays = rays0.replace(origin=rays0.origin + 1.7e-6 * (i + 1))
    return trace_image_fast(scene, rays, 128, 128, accel=accel)
timed(frame, 128 * 128)
""", 420)
    if not probe("probe2") or not ok:
        log({"step": "abort", "why": "fast128 wedged/failed"})
        return

    # 3. fast megapass at 512 film (the headline)
    ok = run_py("fast512", FAST512, 2700)
    probe("probe3")
    if not ok:
        log({"step": "note", "why": "fast512 failed; continuing to volume"})

    # 4. volume march 512 (no pallas in this path)
    run_py("volume512", VOLUME512, 1800)
    probe("probe4")

    # 5. optional soak: N back-to-back fast frames, probe after
    if soak_n:
        run_py("soak", soak_code(soak_n), 1200 + 30 * soak_n)
        probe("probe_soak")
    log({"step": "campaign_done"})


if __name__ == "__main__":
    main()
