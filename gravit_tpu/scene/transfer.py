"""Transfer functions: .cmap/.omap loading + 256-entry LUT resampling.

Parity target: TransferFunction::load (TransferFunction.cpp:91-136): both
maps resample onto 256 entries at x = xmin + (i/255)*(xmax-xmin) by
piecewise-linear interpolation; the LUT is then applied over a [low, high]
value range (OSPRay "piecewise_linear" semantics, set() at :76-86).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def _resample_256(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Reference resampling loop (TransferFunction.cpp:116-135)."""
    out = np.zeros((256,) + ys.shape[1:], np.float32)
    xmin, xmax = xs[0], xs[-1]
    i0, i1 = 0, 1
    for i in range(256):
        x = min(xmin + (i / 255.0) * (xmax - xmin), xmax)
        while xs[i1] < x:
            i0 += 1
            i1 += 1
        d = (x - xs[i0]) / (xs[i1] - xs[i0])
        out[i] = ys[i0] + d * (ys[i1] - ys[i0])
    return out


@dataclasses.dataclass
class TransferFunction:
    color_lut: np.ndarray    # (256, 3)
    opacity_lut: np.ndarray  # (256,)
    low: float = 0.0
    high: float = 1.0

    @classmethod
    def from_files(cls, cmap_path: str, omap_path: str,
                   low: float = 0.0, high: float = 1.0):
        cdata = _read_table(cmap_path)
        odata = _read_table(omap_path)
        color = _resample_256(cdata[:, 0], cdata[:, 1:4])
        # an .omap is (scalar, opacity); if handed a 4-col .cmap (as
        # gvtVol_serial.py does) use its 2nd column as opacity
        opacity = _resample_256(odata[:, 0], odata[:, 1])
        return cls(color, opacity, float(low), float(high))

    @classmethod
    def gray_ramp(cls, low: float = 0.0, high: float = 1.0,
                  max_opacity: float = 1.0):
        ramp = np.linspace(0.0, 1.0, 256, dtype=np.float32)
        color = np.stack([ramp] * 3, axis=-1)
        return cls(color, (ramp * max_opacity).astype(np.float32),
                   float(low), float(high))

    def device_luts(self):
        return (jnp.asarray(self.color_lut), jnp.asarray(self.opacity_lut),
                jnp.asarray([self.low, self.high], jnp.float32))


def _read_table(path: str) -> np.ndarray:
    """First token = row count, then rows of floats (cmap: 4, omap: 2)."""
    with open(path) as f:
        toks = f.read().split()
    n = int(toks[0])
    vals = np.asarray([float(t) for t in toks[1:]], np.float64)
    cols = len(vals) // n
    return vals[: n * cols].reshape(n, cols)


def apply_tf(color_lut, opacity_lut, vrange, scalar):
    """Piecewise-linear LUT lookup over [low, high]; scalar (...,) -> rgb, a.

    Color and opacity are looked up through ONE packed (256, 4) rgba table
    (two row-gathers instead of four): the concat is loop-invariant so XLA
    hoists it out of the march loop, and it stays differentiable wrt both
    LUTs.
    """
    rgba = jnp.concatenate([color_lut, opacity_lut[:, None]], axis=1)
    # adjacent-entry PAIRS packed per row: one 8-wide row gather per lookup
    # instead of two 4-wide ones (row gathers vectorize on TPU; element /
    # extra gathers pay a fixed per-op cost). Loop-invariant, hoisted.
    pairs = jnp.concatenate([rgba[:-1], rgba[1:]], axis=1)     # (255, 8)
    x = (scalar - vrange[0]) / jnp.maximum(vrange[1] - vrange[0], 1e-30)
    x = jnp.clip(x, 0.0, 1.0) * 255.0
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, 254)
    frac = (x - i0)[..., None]
    p = pairs[i0]
    v = p[..., 0:4] * (1 - frac) + p[..., 4:8] * frac
    return v[..., 0:3], v[..., 3]
