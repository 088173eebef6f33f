"""Analytic volume-rendering oracle (VERDICT r4 weak #4).

The regression volume rows assert internal consistency (slice march vs
gather march), which a TF-orientation or opacity-correction bug shared by
both formulations would pass. These tests pin BOTH engines to values
computed independently, in float64 numpy, straight from the compositing
model's definition (reference semantics: ColorAccumulator.h:95-241 —
front-to-back `c += (1-w)*a*rgb; w += (1-w)*a` with the oblique-path
opacity correction a = 1-(1-a_tf)^(arc/base)):

  * a CONSTANT-density slab has the closed form w = 1-(1-a)^m for m
    samples — checked against each engine's own documented sample ladder
    (tight) AND against the continuous closed form 1-(1-a0)^(L/base)
    where L is the geometric path length in base-step units (loose, the
    non-self-referential anchor; exercised axis-aligned AND oblique so a
    wrong arc correction cannot cancel),
  * a LINEAR-RAMP field under ramp TF LUTs yields analytic per-sample
    (rgb, alpha), so the full composite is computable outside the
    engines — a flipped TF index orientation or a back-to-front march
    changes the result and fails.
"""

import numpy as np
import jax.numpy as jnp

from gravit_tpu.ops.slice_march import slice_march, slice_march_reference
from gravit_tpu.ops.volume_march import march_brick

N_RAYS = 1024            # slice_march block width
NZ = 64                  # cubic brick, spacing 1, origin 0


def _const_lut(rgb, alpha):
    color = np.tile(np.asarray(rgb, np.float32), (256, 1))
    op = np.full((256,), alpha, np.float32)
    return jnp.asarray(color), jnp.asarray(op)


def _rays(direction):
    """N_RAYS rays with interior (x, y) start points, z start above the
    brick, all sharing `direction` (unit, -z dominant)."""
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    z0 = 80.0
    # pick each ray's x at its z=0 EXIT point so the whole z-traverse
    # [0, NZ-1] stays interior even for oblique directions (x drifts by
    # `shift` over the traverse)
    shift = (NZ - 1) * d[0] / abs(d[2])
    lo_x = 1.0 + max(shift, 0.0)
    hi_x = NZ - 2.5 + min(shift, 0.0)
    xs_exit = np.linspace(lo_x, hi_x, 32)
    ys = np.linspace(8.0, 55.0, 32)
    gx, gy = np.meshgrid(xs_exit, ys)
    t_bot = z0 / abs(d[2])               # t at the z=0 exit
    o = np.stack([gx.ravel() - t_bot * d[0], gy.ravel(),
                  np.full(N_RAYS, z0)], axis=1)
    dirs = np.tile(d, (N_RAYS, 1))
    t_top = (z0 - (NZ - 1)) / -d[2]
    for t in (t_top, t_bot):
        p = o + t * d
        assert (p[:, 0] > 0.5).all() and (p[:, 0] < NZ - 1.5).all()
        assert (p[:, 1] > 0.5).all() and (p[:, 1] < NZ - 1.5).all()
    return o, dirs


def _run_engines(samples, color_lut, opacity_lut, o, d, step=1.0,
                 low=0.0, high=1.0):
    """(slice_kernel, slice_reference, gather_march) results as
    (color (N,3), w (N,)) float64 tuples."""
    o_j = jnp.asarray(o, jnp.float32)
    d_j = jnp.asarray(d, jnp.float32)
    act = jnp.ones((N_RAYS,), bool)
    c0 = jnp.zeros((N_RAYS, 3), jnp.float32)
    w0 = jnp.zeros((N_RAYS,), jnp.float32)
    S = jnp.asarray(samples, jnp.float32)
    meta = dict(axis=2, flip=True, step=float(step), base_step=1.0,
                low=float(low), high=float(high),
                origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0))
    outs = []
    for fn in (lambda: slice_march(o_j, d_j, act, c0, w0, S, color_lut,
                                   opacity_lut, interpret=True, **meta),
               lambda: slice_march_reference(o_j, d_j, act, c0, w0, S,
                                             color_lut, opacity_lut,
                                             **meta)):
        c, w, _ = fn()
        outs.append((np.asarray(c, np.float64), np.asarray(w, np.float64)))
    c, w, _ = march_brick(
        o_j, d_j, act, c0, w0, S,
        jnp.zeros(3), jnp.ones(3), jnp.zeros(3),
        jnp.full((3,), float(NZ - 1)),
        color_lut, opacity_lut, jnp.asarray([low, high], jnp.float32),
        float(step), 256, early_exit=False)
    outs.append((np.asarray(c, np.float64), np.asarray(w, np.float64)))
    return outs


def _composite(rgbs, alphas):
    """The textbook front-to-back recurrence in float64."""
    c = np.zeros(3)
    w = 0.0
    for rgb, a in zip(rgbs, alphas):
        c = c + (1.0 - w) * a * np.asarray(rgb, np.float64)
        w = w + (1.0 - w) * a
    return c, w


def test_constant_slab_closed_form():
    """Constant field + constant TF: w = 1-(1-a_corr)^m per engine ladder,
    and both engines within discretization distance of the CONTINUOUS
    closed form 1-(1-a0)^(L/base). Axis-aligned and oblique."""
    a0 = 0.02
    rgb0 = np.array([0.8, 0.4, 0.1])
    color_lut, opacity_lut = _const_lut(rgb0, a0)
    samples = np.full((NZ, NZ, NZ), 0.5, np.float32)

    for direction in ((0.0, 0.0, -1.0), (0.6, 0.0, -0.8)):
        o, d = _rays(direction)
        dz = abs(d[0, 2])
        (c_k, w_k), (c_r, w_r), (c_m, w_m) = _run_engines(
            samples, color_lut, opacity_lut, o, d)

        # slice ladder: n_planes = ceil(NZ-1 / dzg) samples, all interior
        # for these rays; per-plane arc = step/|dz| in base units
        n_planes = NZ - 1
        a_slice = 1.0 - (1.0 - a0) ** (1.0 / dz)
        w_slice = 1.0 - (1.0 - a_slice) ** n_planes
        np.testing.assert_allclose(w_k, w_slice, atol=2e-5)
        np.testing.assert_allclose(w_r, w_slice, atol=2e-5)
        np.testing.assert_allclose(c_k, np.tile(rgb0, (N_RAYS, 1)) * w_slice, atol=2e-5)
        np.testing.assert_allclose(c_r, np.tile(rgb0, (N_RAYS, 1)) * w_slice, atol=2e-5)

        # gather ladder: samples at t_in + step*(k+0.5) < t_out,
        # t_out-t_in = (NZ-1)/|dz|; arc per sample = step = base
        n_march = int(np.floor((NZ - 1) / dz - 0.5)) + 1
        w_march = 1.0 - (1.0 - a0) ** n_march
        np.testing.assert_allclose(w_m, w_march, atol=2e-5)
        np.testing.assert_allclose(c_m, np.tile(rgb0, (N_RAYS, 1)) * w_march, atol=2e-5)

        # continuous anchor: L = (NZ-1)/|dz| base steps through the brick.
        # Discretization puts each engine within one sample of it.
        w_cont = 1.0 - (1.0 - a0) ** ((NZ - 1) / dz)
        for w_eng in (w_k, w_r, w_m):
            assert np.abs(w_eng - w_cont).max() < a0 * 1.5, (
                direction, float(np.abs(w_eng - w_cont).max()))


def test_ramp_tf_orientation():
    """Linear-ramp field + ramp TF LUTs: per-sample (rgb, a) are analytic,
    so the composite is computable outside the engines. Color ramps
    red (low scalar) -> blue (high scalar): a flipped TF orientation or a
    back-to-front march swaps the red/blue balance and fails."""
    amax = 0.06
    zc = np.arange(NZ, dtype=np.float64)
    samples = np.broadcast_to(zc[:, None, None] / (NZ - 1),
                              (NZ, NZ, NZ)).astype(np.float32)
    idx = np.arange(256, dtype=np.float64) / 255.0
    color = np.stack([1.0 - idx, np.zeros(256), idx], axis=1)
    color_lut = jnp.asarray(color, jnp.float32)
    opacity_lut = jnp.asarray(idx * amax, jnp.float32)

    o, d = _rays((0.0, 0.0, -1.0))
    (c_k, w_k), (c_r, w_r), (c_m, w_m) = _run_engines(
        samples, color_lut, opacity_lut, o, d)

    def tf(s):
        x = np.clip(s, 0.0, 1.0)
        return np.array([1.0 - x, 0.0, x]), x * amax

    # slice ladder: planes zg = k+0.5 in the FLIPPED frame = world
    # z = (NZ-1) - (k+0.5), marched front-to-back from the +z eye side
    z_slice = (NZ - 1) - (np.arange(NZ - 1) + 0.5)
    pairs = [tf(z / (NZ - 1)) for z in z_slice]
    c_or, w_or = _composite([p[0] for p in pairs], [p[1] for p in pairs])
    np.testing.assert_allclose(w_k, w_or, atol=2e-4)
    np.testing.assert_allclose(w_r, w_or, atol=2e-4)
    np.testing.assert_allclose(c_k, np.tile(c_or, (N_RAYS, 1)), atol=2e-4)
    np.testing.assert_allclose(c_r, np.tile(c_or, (N_RAYS, 1)), atol=2e-4)

    # gather ladder: z = 80 - (t_in + k + 0.5), t_in = 80 - (NZ-1)
    z_march = (NZ - 1) - (np.arange(NZ - 1) + 0.5)
    pairs = [tf(z / (NZ - 1)) for z in z_march]
    c_om, w_om = _composite([p[0] for p in pairs], [p[1] for p in pairs])
    np.testing.assert_allclose(w_m, w_om, atol=2e-4)
    np.testing.assert_allclose(c_m, np.tile(c_om, (N_RAYS, 1)), atol=2e-4)

    # the red/blue balance itself (the orientation signal): the eye-near
    # half is HIGH scalar -> blue deposits first -> blue dominates red
    assert (c_k[:, 2] > c_k[:, 0] * 1.5).all()


def test_iso_crossing_analytic():
    """Isosurface oracle: on the linear-ramp field the crossing plane,
    the pre-crossing volume composite, the gradient (0, 0, c) and the
    headlight shade (|n.v| = 1 for axis-aligned rays -> ISO_KA+ISO_KD)
    are all analytic. Both the slice engines and the gather march must
    deposit exactly (1 - w_pre) * rgb_tf(iso) * 1.0 on top of the
    analytic pre-crossing composite, with w = 1 (opaque flags)."""
    import jax

    from gravit_tpu.core.rays import RAY_OPAQUE

    amax = 0.06
    iso = 0.47                      # strictly between two plane samples
    zc = np.arange(NZ, dtype=np.float64)
    samples = np.broadcast_to(zc[:, None, None] / (NZ - 1),
                              (NZ, NZ, NZ)).astype(np.float32)
    idx = np.arange(256, dtype=np.float64) / 255.0
    color = np.stack([1.0 - idx, np.zeros(256), idx], axis=1)
    color_lut = jnp.asarray(color, jnp.float32)
    opacity_lut = jnp.asarray(idx * amax, jnp.float32)

    o, d = _rays((0.0, 0.0, -1.0))

    o_j = jnp.asarray(o, jnp.float32)
    d_j = jnp.asarray(d, jnp.float32)
    act = jnp.ones((N_RAYS,), bool)
    c0 = jnp.zeros((N_RAYS, 3), jnp.float32)
    w0 = jnp.zeros((N_RAYS,), jnp.float32)
    S = jnp.asarray(samples, jnp.float32)
    meta = dict(axis=2, flip=True, step=1.0, base_step=1.0,
                low=0.0, high=1.0, origin=(0.0, 0.0, 0.0),
                spacing=(1.0, 1.0, 1.0), isovalues=(iso,))
    outs = []
    c, w, f = slice_march(o_j, d_j, act, c0, w0, S, color_lut,
                          opacity_lut, interpret=True, **meta)
    outs.append((c, w, f))
    c, w, f = slice_march_reference(o_j, d_j, act, c0, w0, S, color_lut,
                                    opacity_lut, **meta)
    outs.append((c, w, f))
    c, w, f = march_brick(
        o_j, d_j, act, c0, w0, S,
        jnp.zeros(3), jnp.ones(3), jnp.zeros(3),
        jnp.full((3,), float(NZ - 1)),
        color_lut, opacity_lut, jnp.asarray([0.0, 1.0], jnp.float32),
        1.0, 256, isovalues=(iso,), early_exit=False)
    outs.append((c, w, f))

    # oracle: ladder z = (NZ-1) - (k+0.5); cross at first plane with
    # s < iso (descending ramp); composite planes before it, then the
    # surface deposit with shade exactly ISO_KA + ISO_KD
    def tf(s):
        x = np.clip(s, 0.0, 1.0)
        return np.array([1.0 - x, 0.0, x]), x * amax

    z_planes = (NZ - 1) - (np.arange(NZ - 1) + 0.5)
    s_planes = z_planes / (NZ - 1)
    k_cross = int(np.argmax(s_planes < iso))
    assert 0 < k_cross < NZ - 2
    pairs = [tf(s) for s in s_planes[:k_cross]]
    c_pre, w_pre = _composite([p[0] for p in pairs], [p[1] for p in pairs])
    rgb_iso = tf(iso)[0]
    c_exp = c_pre + (1.0 - w_pre) * rgb_iso * (0.4 + 0.6 * 1.0)

    for c, w, f in outs:
        c, w, f = np.asarray(c, np.float64), np.asarray(w), np.asarray(f)
        np.testing.assert_allclose(w, 1.0, atol=1e-6)
        assert (f == RAY_OPAQUE).all()
        np.testing.assert_allclose(c, np.tile(c_exp, (N_RAYS, 1)),
                                   atol=3e-4)
