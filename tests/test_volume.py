"""Volume path tests: TF resampling, trilinear sampling, analytic
integration, full brick render, and the multi-brick boundary protocol."""

import jax.numpy as jnp
import numpy as np

from gravit_tpu.core.rays import RAY_BOUNDARY, RAY_OPAQUE
from gravit_tpu.ops.volume_march import march_brick, trilinear
from gravit_tpu.render.volume_scene import build_volume_scene
from gravit_tpu.render.volume_tracer import trace_volume
from gravit_tpu.render.tracer import make_arena
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.transfer import TransferFunction, apply_tf
from gravit_tpu.scene.volume import Volume, wavelet_volume


def test_tf_resample_reference_semantics(tmp_path):
    cmap = tmp_path / "t.cmap"
    cmap.write_text("2\n0.0 0.0 0.0 0.0\n1.0 1.0 0.5 0.25\n")
    omap = tmp_path / "t.omap"
    omap.write_text("2\n0.0 0.0\n1.0 1.0\n")
    tf = TransferFunction.from_files(str(cmap), str(omap), 0.0, 1.0)
    assert tf.color_lut.shape == (256, 3)
    np.testing.assert_allclose(tf.color_lut[255], [1.0, 0.5, 0.25], rtol=1e-6)
    np.testing.assert_allclose(tf.opacity_lut[128], 128 / 255.0, rtol=1e-5)
    rgb, a = apply_tf(jnp.asarray(tf.color_lut), jnp.asarray(tf.opacity_lut),
                      jnp.asarray([0.0, 1.0]), jnp.asarray([0.5]))
    np.testing.assert_allclose(a[0], 0.5, atol=1e-2)


def test_trilinear_linear_field():
    # f(x,y,z) = x + 10y + 100z on a 4^3 grid is reproduced exactly
    n = 4
    idx = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    f = x + 10 * y + 100 * z
    samples = jnp.asarray(np.transpose(f, (2, 1, 0)))  # (nz,ny,nx)
    pos = jnp.asarray([[1.5, 0.25, 2.0], [0.1, 2.9, 0.6]])
    out = trilinear(samples, jnp.zeros(3), jnp.ones(3), pos)
    np.testing.assert_allclose(
        out, [1.5 + 2.5 + 200.0, 0.1 + 29.0 + 60.0], rtol=1e-5)


def test_march_constant_volume_analytic():
    """Constant alpha per step: w after k steps = 1-(1-a)^k."""
    n = 9
    samples = np.full((n, n, n), 0.5, np.float32)
    tf = TransferFunction.gray_ramp(low=0.0, high=1.0, max_opacity=0.2)
    v = Volume(samples=samples, origin=np.zeros(3, np.float32),
               spacing=np.ones(3, np.float32), sampling_rate=1.0, tf=tf)
    o = jnp.asarray([[-1.0, 4.0, 4.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    color, w, flags = march_brick(
        o, d, jnp.asarray([True]), jnp.zeros((1, 3)), jnp.zeros((1,)),
        jnp.asarray(v.samples), jnp.asarray(v.origin),
        jnp.asarray(v.spacing), jnp.asarray(v.bounds_min),
        jnp.asarray(v.bounds_max),
        *[jnp.asarray(x) for x in (tf.color_lut, tf.opacity_lut,
                                   [tf.low, tf.high])],
        v.step_size(), v.max_steps())
    # alpha per sample = 0.2 * 0.5 = 0.1; path length 8 -> 8 samples
    k = 8
    expect_w = 1 - (1 - 0.1) ** k
    np.testing.assert_allclose(float(w[0]), expect_w, rtol=0.15)
    assert int(flags[0]) == RAY_BOUNDARY
    # color is gray (r=g=b) and bounded by opacity
    assert abs(float(color[0, 0]) - float(color[0, 1])) < 1e-6
    assert float(color[0, 0]) <= float(w[0]) + 1e-5


def test_march_opaque_termination():
    n = 9
    samples = np.full((n, n, n), 1.0, np.float32)
    tf = TransferFunction.gray_ramp(low=0.0, high=1.0, max_opacity=1.0)
    v = Volume(samples=samples, origin=np.zeros(3, np.float32),
               spacing=np.ones(3, np.float32), tf=tf)
    o = jnp.asarray([[-1.0, 4.0, 4.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    _, w, flags = march_brick(
        o, d, jnp.asarray([True]), jnp.zeros((1, 3)), jnp.zeros((1,)),
        jnp.asarray(v.samples), jnp.asarray(v.origin),
        jnp.asarray(v.spacing), jnp.asarray(v.bounds_min),
        jnp.asarray(v.bounds_max),
        *[jnp.asarray(x) for x in (tf.color_lut, tf.opacity_lut,
                                   [tf.low, tf.high])],
        v.step_size(), v.max_steps())
    assert int(flags[0]) == RAY_OPAQUE
    assert float(w[0]) >= 0.99


def _volume_camera(w, h, n):
    c = (n - 1) / 2.0
    return PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=(c, c, c), up=(0.0, 0.0, 1.0),
        fov=float(30 * np.pi / 180), film_width=w, film_height=h,
        samples=1, max_depth=1, jitter_window=0.5)


def test_volume_render_single_brick():
    n = 32
    vol = wavelet_volume(n)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    cam = _volume_camera(24, 24, n)
    arena = make_arena(cam.generate_rays(volume=True), 0)
    fb = trace_volume(scene, arena, 24, 24, max_rounds=8)
    a = np.asarray(fb)
    assert np.isfinite(a).all()
    assert (a[:, :3].sum(-1) > 0).sum() > 50  # volume visible
    assert a[:, :3].max() <= 1.0 + 1e-6


def test_volume_bricked_matches_single():
    """Domain decomposition invariance: 2 half-bricks == 1 full brick."""
    n = 32
    full = wavelet_volume(n)
    tf = full.tf
    # split along x at plane x=16 with shared boundary layer (like VolApp's
    # brick reader which repeats the boundary sample row)
    s = full.samples  # (nz, ny, nx)
    left = Volume(samples=s[:, :, : n // 2 + 1].copy(),
                  origin=np.array([0, 0, 0], np.float32),
                  spacing=np.ones(3, np.float32), tf=tf)
    right = Volume(samples=s[:, :, n // 2:].copy(),
                   origin=np.array([n // 2, 0, 0], np.float32),
                   spacing=np.ones(3, np.float32), tf=tf)

    cam = _volume_camera(24, 24, n)
    eye = np.eye(4, dtype=np.float32)
    scene1 = build_volume_scene([full], [(0, eye)])
    scene2 = build_volume_scene([left, right], [(0, eye), (1, eye)])
    arena = make_arena(cam.generate_rays(volume=True), 0)
    fb1 = np.asarray(trace_volume(scene1, arena, 24, 24, max_rounds=8))
    fb2 = np.asarray(trace_volume(scene2, arena, 24, 24, max_rounds=8))
    # integration restarts at the brick boundary, so allow small differences
    err = np.abs(fb1[:, :3] - fb2[:, :3]).max()
    assert err < 0.06, f"brick decomposition changed the image by {err}"


def test_amr_subgrid_sampling():
    """A fine subgrid overrides the coarse grid inside its bounds."""
    import jax.numpy as jnp
    from gravit_tpu.ops.volume_march import sample_amr

    n = 8
    coarse = np.zeros((n, n, n), np.float32)
    fine = np.full((5, 5, 5), 7.0, np.float32)  # covers [2,4]^3 at 0.5 spacing
    sub = (jnp.asarray(fine), jnp.asarray([2.0, 2.0, 2.0]),
           jnp.asarray([0.5, 0.5, 0.5]), jnp.asarray([2.0, 2.0, 2.0]),
           jnp.asarray([4.0, 4.0, 4.0]))
    pos = jnp.asarray([[3.0, 3.0, 3.0], [6.0, 6.0, 6.0]])
    s = sample_amr(jnp.asarray(coarse), jnp.zeros(3), jnp.ones(3), pos,
                   subgrids=(sub,))
    np.testing.assert_allclose(np.asarray(s), [7.0, 0.0], atol=1e-6)


def test_amr_render_via_api():
    from gravit_tpu import api
    from gravit_tpu.render.renderer import Renderer
    from gravit_tpu.scene.transfer import TransferFunction

    Renderer.reset()
    api.gvtInit()
    n = 16
    api.createVolume("amrvol", amr=True)
    node = api._db().find("amrvol")
    node["tf"] = TransferFunction.gray_ramp(low=0.0, high=10.0,
                                            max_opacity=0.3)
    api.addVolumeSamples("amrvol", np.zeros(n * n * n, np.float32),
                         [n, n, n], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], 1.0)
    # fine subgrid filled with high values in the center
    api.addAmrSubgrid("amrvol", 1, 1, np.full(9 * 9 * 9, 9.0, np.float32),
                      [9, 9, 9], [4.0, 4.0, 4.0], [0.5, 0.5, 0.5])
    api.addInstance("inst0", "amrvol", np.eye(4, dtype=np.float32).flatten())
    api.addCamera("cam", [64.0, 64.0, 64.0], [7.5, 7.5, 7.5],
                  [0.0, 0.0, 1.0], 30 * np.pi / 180, 1, 1, 0.5)
    api.addFilm("film", 16, 16, "amr_out")
    api.addRenderer("vr", 6, 1, "cam", "film", volume=True)
    api.render("vr")
    fb = np.asarray(Renderer.instance().framebuffer("vr"))
    # coarse grid is all zeros -> any signal comes from the AMR subgrid
    assert fb[:, :3].sum() > 0.01


def test_isosurface_and_slice():
    """Isovalue crossing renders an opaque shaded surface; slice plane too."""
    n = 24
    # radial field: sphere isosurface at r=6
    idx = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    c = (n - 1) / 2
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    samples = np.transpose(r, (2, 1, 0)).astype(np.float32)
    tf = TransferFunction.gray_ramp(low=0.0, high=float(r.max()),
                                    max_opacity=0.0)  # no volume opacity
    vol = Volume(samples=samples, origin=np.zeros(3, np.float32),
                 spacing=np.ones(3, np.float32), tf=tf, isovalues=(6.0,))
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    cam = _volume_camera(24, 24, n)
    arena = make_arena(cam.generate_rays(volume=True), 0)
    fb = np.asarray(trace_volume(scene, arena, 24, 24, max_rounds=6))
    # the sphere must be visible (opacity-only tf contributes nothing)
    assert (fb[:, 3] > 0.5).sum() > 20, "isosurface not rendered"
    assert np.isfinite(fb).all()

    vol2 = Volume(samples=samples, origin=np.zeros(3, np.float32),
                  spacing=np.ones(3, np.float32), tf=tf,
                  slices=((1.0, 0.0, 0.0, -float(c)),))
    scene2 = build_volume_scene([vol2], [(0, np.eye(4, dtype=np.float32))])
    fb2 = np.asarray(trace_volume(scene2, arena, 24, 24, max_rounds=6))
    assert (fb2[:, 3] > 0.5).sum() > 20, "slice plane not rendered"
