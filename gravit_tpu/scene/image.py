"""Framebuffer + PPM I/O + image diff.

Reference semantics: composite/IceTComposite.cpp:103-157 (localAdd clamps each
channel at 1.0; PPM written bottom-to-top with byte = trunc(c*255)) and
apps/render/ImageDiff.cpp (tolerance compare). The framebuffer is a flat
`(W*H, 4)` float32 device array; deposits are masked segment-sums — the
scatter-add equivalent of GraviT's per-row-mutex `localAdd` (clamp-after-add
over nonnegative contributions is order-independent, so one scatter-add then
clamp is bit-equivalent to GraviT's serialized adds).
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np


def new_framebuffer(width: int, height: int) -> jnp.ndarray:
    return jnp.zeros((width * height, 4), jnp.float32)


def local_add(fb: jnp.ndarray, pixel_id, color, alpha, mask) -> jnp.ndarray:
    """Accumulate masked per-ray contributions, clamping rgb at 1.0.

    `pixel_id (N,) int32`, `color (N,3)`, `alpha (N,)`, `mask (N,) bool`.
    """
    pix = jnp.where(mask, pixel_id, fb.shape[0])  # out-of-range lanes dropped
    rgba = jnp.concatenate([color, alpha[:, None]], axis=-1)
    fb = fb.at[pix].add(rgba, mode="drop")
    return clamp_rgb(fb)


def clamp_rgb(fb: jnp.ndarray) -> jnp.ndarray:
    """Clamp rgb channels at 1.0 (elementwise, autodiff-friendly)."""
    return jnp.concatenate([jnp.minimum(fb[:, :3], 1.0), fb[:, 3:]], axis=-1)


def composite(fb: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """Cross-device framebuffer reduction (IceT replacement).

    Inside shard_map/pmap pass `axis_name`; contributions from all chips are
    psum'd then clamped, which matches IceT BLEND for the surface path where
    each rank deposits disjoint (or nonneg-additive) pixels.
    """
    if axis_name is not None:
        import jax

        fb = jax.lax.psum(fb, axis_name)
    return clamp_rgb(fb)


def to_rgb8(fb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Flat rgba float framebuffer -> (H, W, 3) uint8, top row first.

    Truncating byte conversion and bottom-to-top row flip replicate
    IceTComposite::write (IceTComposite.cpp:144-153).
    """
    img = np.asarray(fb)[:, :3].reshape(height, width, 3)
    img = np.clip(img, 0.0, 1.0)
    img = (img * 255.0).astype(np.uint8)
    return img[::-1]  # reference writes rows bottom-to-top


def write_ppm(path: str, fb, width: int, height: int) -> None:
    rgb = to_rgb8(np.asarray(fb), width, height)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (width, height))
        f.write(rgb.tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read binary P6 PPM -> (H, W, 3) uint8, top row first."""
    data = pathlib.Path(path).read_bytes()
    # header: magic, dims, maxval separated by whitespace (no comment support
    # needed; reference writer emits none)
    parts = data.split(maxsplit=4)
    assert parts[0] == b"P6", f"not a binary PPM: {path}"
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    assert maxval == 255
    raw = parts[4][: w * h * 3]
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def image_diff(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of differing pixel bytes, the ImageDiff.cpp metric."""
    if a.shape != b.shape:
        return 1.0
    return float(np.mean(a.astype(np.int32) != b.astype(np.int32)))


def max_byte_error(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.max(np.abs(a.astype(np.int32) - b.astype(np.int32))))
