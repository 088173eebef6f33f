"""Ray-marched volume integration (the ospTraceRays/GregSpray equivalent).

The reference delegates brick integration to the external GregSpray engine
(adapter/ospray/OSPRayAdapter.cpp:301); rays carry accumulated rgb in
`color`, opacity in `w`, and termination flags in `depth` (ORays.h:10-14).
Here the integrator is explicit: front-to-back compositing of trilinear
samples through a 256-entry piecewise-linear transfer-function LUT, with
step = min(spacing)/sampling_rate and opacity correction for non-unit
steps. Fully differentiable wrt samples, TF LUTs, and ray state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gravit_tpu.core.rays import RAY_BOUNDARY, RAY_OPAQUE

OPACITY_TERMINATION = 0.99


def trilinear(samples: jax.Array, origin, spacing, pos):
    """Trilinear interpolation; samples (nz, ny, nx); pos (..., 3) world."""
    nz, ny, nx = samples.shape
    f = (pos - origin) / spacing                       # grid coords (x,y,z)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 2)
    iz = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 2)
    tx = jnp.clip(fx - ix, 0.0, 1.0)
    ty = jnp.clip(fy - iy, 0.0, 1.0)
    tz = jnp.clip(fz - iz, 0.0, 1.0)

    def at(dz, dy, dx):
        return samples[iz + dz, iy + dy, ix + dx]

    c00 = at(0, 0, 0) * (1 - tx) + at(0, 0, 1) * tx
    c01 = at(0, 1, 0) * (1 - tx) + at(0, 1, 1) * tx
    c10 = at(1, 0, 0) * (1 - tx) + at(1, 0, 1) * tx
    c11 = at(1, 1, 0) * (1 - tx) + at(1, 1, 1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def sample_amr(samples, origin, spacing, pos, subgrids=()):
    """Sample the finest grid containing each position.

    subgrids: tuple of (samples, origin, spacing, lo, hi), ordered coarse ->
    fine (finer levels LAST so they override; Volume.h griddata tree).
    """
    s = trilinear(samples, origin, spacing, pos)
    for sub_samples, sub_origin, sub_spacing, sub_lo, sub_hi in subgrids:
        inside = jnp.all((pos >= sub_lo) & (pos <= sub_hi), axis=-1)
        s_fine = trilinear(sub_samples, sub_origin, sub_spacing, pos)
        s = jnp.where(inside, s_fine, s)
    return s


@functools.partial(jax.jit, static_argnames=("max_steps",))
def march_brick(o, d, active, color_in, w_in,
                samples, origin, spacing, lo, hi,
                color_lut, opacity_lut, vrange,
                step: float | jax.Array, max_steps: int,
                subgrids=()):
    """March active rays through one brick; returns (color, w, exited_flags).

    o, d:   (N, 3) rays in the brick's coordinate frame (d need not be unit;
            t is in units of |d|)
    color_in, w_in: accumulated rgb / opacity carried by the rays
    lo, hi: brick bounds (3,)
    Returns (color, w, depth_flags): flags RAY_OPAQUE if the termination
    threshold was crossed, else RAY_BOUNDARY (exited the brick), matching
    the protocol the shuffle expects (DomainTracer.cpp:255-305).
    """
    from gravit_tpu.scene.transfer import apply_tf

    small = jnp.abs(d) < 1e-30
    d_safe = jnp.where(small, 1.0, d)
    inv = jnp.where(small, jnp.where(d < 0, -1e30, 1e30), 1.0 / d_safe)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    t_in = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    t_out = jnp.min(jnp.maximum(t0, t1), axis=-1)

    base_step = jnp.min(spacing)
    correction = step / jnp.maximum(base_step, 1e-30)

    def body(k, carry):
        color, w = carry
        t = t_in + step * (k + 0.5)
        pos = o + t[:, None] * d
        inside = active & (t < t_out) & (w < OPACITY_TERMINATION)
        s = sample_amr(samples, origin, spacing, pos, subgrids)
        rgb, a = apply_tf(color_lut, opacity_lut, vrange, s)
        a = 1.0 - jnp.power(jnp.maximum(1.0 - a, 0.0), correction)
        a = jnp.where(inside, a, 0.0)
        color = color + (1.0 - w)[:, None] * a[:, None] * rgb
        w = w + (1.0 - w) * a
        return color, w

    color, w = jax.lax.fori_loop(0, max_steps, body, (color_in, w_in))
    opaque = w >= OPACITY_TERMINATION
    flags = jnp.where(opaque, RAY_OPAQUE, RAY_BOUNDARY)
    return color, w, jnp.where(active, flags, 0)
