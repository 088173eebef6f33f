"""Where does the volume frame's time go? Times march_brick alone, a
pure-gather analog of its memory traffic, and the full trace_volume frame.

  python scripts/micro_volume.py
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from gravit_tpu.ops.volume_march import corner_table, march_brick
from gravit_tpu.render.tracer import make_arena
from gravit_tpu.render.volume_scene import build_volume_scene
from gravit_tpu.render.volume_tracer import trace_volume
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.volume import wavelet_volume


def timed(fn, *args, reps=5):
    float(np.asarray(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(fn(*args)))
        ts.append(time.time() - t0)
        args = tuple(a + 1e-6 if hasattr(a, "dtype") and
                     jnp.issubdtype(a.dtype, jnp.floating) else a
                     for a in args)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    W = 512
    n = W * W
    nvox = 64
    vol = wavelet_volume(nvox)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    c = (nvox - 1) / 2.0
    cam = PerspectiveCamera(
        eye=(4.0 * nvox, 4.0 * nvox, 4.0 * nvox), focus=(c, c, c),
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=W, film_height=W, samples=1, max_depth=1,
        jitter_window=0.0)
    rays0 = cam.generate_rays(volume=True)
    arena0 = make_arena(rays0, 0)
    out = {"max_steps": int(scene.vol_max_steps[0]),
           "step": float(scene.vol_step[0])}

    # full frame
    @jax.jit
    def frame(s):
        arena = arena0.replace(origin=arena0.origin + s)
        fb = trace_volume(scene, arena, W, W, max_rounds=16)
        return fb[:8, :].sum()
    out["frame_ms"] = round(timed(frame, jnp.float32(1e-4)), 1)

    # march_brick alone on the camera wavefront (one brick pass)
    o = rays0.origin
    d = rays0.direction
    active = jnp.ones((o.shape[0],), bool)

    @jax.jit
    def march_only(s):
        color, w, flags = march_brick(
            o + s, d, active,
            jnp.zeros((o.shape[0], 3), jnp.float32),
            jnp.zeros((o.shape[0],), jnp.float32),
            scene.vol_samples[0], scene.vol_origin[0], scene.vol_spacing[0],
            scene.vol_lo[0], scene.vol_hi[0],
            scene.vol_color_lut[0], scene.vol_opacity_lut[0],
            scene.vol_vrange[0], scene.vol_step[0],
            int(scene.vol_max_steps[0]))
        return color.sum() + w.sum()
    out["march_only_ms"] = round(timed(march_only, jnp.float32(1e-4)), 1)

    # pure gather analog: same number of corner-row + TF-row gathers
    msteps = int(scene.vol_max_steps[0])
    corners = corner_table(scene.vol_samples[0])
    pairs = jnp.concatenate(
        [jnp.concatenate([scene.vol_color_lut[0],
                          scene.vol_opacity_lut[0][:, None]], axis=1)[:-1],
         jnp.concatenate([scene.vol_color_lut[0],
                          scene.vol_opacity_lut[0][:, None]], axis=1)[1:]],
        axis=1)
    key = jax.random.key(0)
    cells = jax.random.randint(key, (n, 8), 0, corners.shape[0])
    tfi = jax.random.randint(key, (n, 8), 0, 255)

    @jax.jit
    def gathers(salt):
        def body(k, acc):
            c = corners[(cells + k) % corners.shape[0]]
            p = pairs[(tfi + k) % 255]
            return acc + c.sum() + p.sum()
        return jax.lax.fori_loop(0, (msteps + 7) // 8, body, salt)
    out["gather_analog_ms"] = round(timed(gathers, jnp.float32(0.0)), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
