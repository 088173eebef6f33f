"""Slice-order volume fast path (ops/slice_march.py): the Pallas kernel
must be bit-faithful to its jnp reference twin, the slice discretization
must converge to the gather march, and trace_volume_fast must agree with
the arena tracer at image tolerance."""

import numpy as np
import jax
import jax.numpy as jnp

from gravit_tpu.ops.slice_march import (slice_march, slice_march_reference,
                                        choose_slice_axis)
from gravit_tpu.ops.volume_march import march_brick
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.volume import wavelet_volume


def _setup(n=32, w=32, h=32, eye_scale=4.0):
    vol = wavelet_volume(n)
    cam = PerspectiveCamera(
        eye=(eye_scale * n, eye_scale * n, eye_scale * n),
        focus=((n - 1) / 2,) * 3, up=(0.0, 0.0, 1.0),
        fov=float(30 * np.pi / 180), film_width=w, film_height=h,
        samples=1, max_depth=1, jitter_window=0.0)
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
    return vol, cam, rays, args, meta


def test_kernel_matches_reference():
    """Pallas kernel (interpret) vs its jnp twin: identical discretization
    -> equal to 1 ulp (XLA may fuse the two lowerings differently; the
    observed worst case is 6e-8 on CPU)."""
    _, _, _, args, meta = _setup()
    c_r, w_r, f_r = slice_march_reference(*args, **meta)
    c_k, w_k, f_k = slice_march(*args, interpret=True, **meta)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_k), np.asarray(f_r))


def test_slice_close_to_march():
    """Slice planes vs per-ray arc steps are different discretizations of
    the same integral; at the default sampling rate the images must agree
    to visual tolerance, and the gap must SHRINK as sampling rate rises
    (both converge to the continuous integral)."""
    vol, cam, rays, args, meta = _setup()
    o, d, act, c0, w0, S, cl, ol = args

    def gap(rate):
        step = float(vol.spacing.min()) / rate
        m = dict(meta, step=step)
        c_s, w_s, _ = slice_march_reference(o, d, act, c0, w0, S, cl, ol,
                                            **m)
        c_m, w_m, _ = march_brick(
            o, d, act, c0, w0, S,
            jnp.asarray(vol.origin), jnp.asarray(vol.spacing),
            jnp.asarray(vol.bounds_min), jnp.asarray(vol.bounds_max),
            cl, ol, jnp.asarray([vol.tf.low, vol.tf.high], jnp.float32),
            step, int(np.ceil(vol.max_steps() * rate)))
        return float(jnp.abs(c_s - c_m).mean()), \
            float(jnp.abs(c_s - c_m).max())

    mean1, max1 = gap(1.0)
    assert mean1 < 2e-3, f"slice vs march mean |dc| {mean1}"
    assert max1 < 0.05, f"slice vs march max |dc| {max1}"
    mean4, _ = gap(4.0)
    assert mean4 < mean1, (mean1, mean4)


def test_trace_volume_fast_matches_tracer():
    """trace_volume_fast vs the arena trace_volume at image tolerance."""
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import (can_slice_march,
                                                 trace_volume,
                                                 trace_volume_fast)

    n, w, h = 32, 24, 24
    vol = wavelet_volume(n)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=w, film_height=h, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    ok, axis, flip = can_slice_march(scene, rays.direction)
    assert ok
    fb_f = np.asarray(trace_volume_fast(scene, rays, w, h,
                                        axis=axis, flip=flip))
    arena = make_arena(rays, 0)
    fb_m = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8))
    err = np.abs(fb_f[:, :3] - fb_m[:, :3])
    assert err.mean() < 2e-3 and err.max() < 0.05, (err.mean(), err.max())
    assert (fb_f[:, :3].sum(-1) > 0).sum() > 20  # scene actually visible


def test_can_slice_march_gates():
    """AMR subgrids / iso / slices / perpendicular rays fall back."""
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import can_slice_march

    n = 16
    vol = wavelet_volume(n)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    d_ok = np.tile(np.array([[0.0, 0.0, -1.0]]), (8, 1))
    assert can_slice_march(scene, d_ok)[0]

    # ray perpendicular to the dominant axis -> fallback
    d_bad = np.concatenate([d_ok, np.array([[1.0, 0.0, 0.0]])])
    assert not can_slice_march(scene, d_bad)[0]

    # feature gates: slices always fall back; isovalues ride the slice
    # engine for VMEM-resident bricks (r5) and fall back above SLAB_BYTES
    import jax.numpy as jnp
    scene_iso = scene.replace(vol_isovalues=((1.0,),))
    assert can_slice_march(scene_iso, d_ok)[0]
    scene_iso_big = scene_iso.replace(
        vol_samples=(jnp.zeros((160, 160, 160), jnp.float32),))
    assert not can_slice_march(scene_iso_big, d_ok)[0]
    # r5: VMEM-resident slice planes ride the slice engine too
    scene_sl = scene.replace(vol_slices=(((1.0, 0.0, 0.0, -1.0),),))
    assert can_slice_march(scene_sl, d_ok)[0]
    scene_sl_big = scene_sl.replace(
        vol_samples=(jnp.zeros((160, 160, 160), jnp.float32),))
    assert not can_slice_march(scene_sl_big, d_ok)[0]

    from gravit_tpu.render.volume_tracer import can_slice_march as csm
    vol2 = wavelet_volume(n)
    sub = wavelet_volume(8)
    sub.level = 1
    vol2.subgrids.append(sub)
    scene_amr = build_volume_scene([vol2],
                                   [(0, np.eye(4, dtype=np.float32))])
    # r5: VMEM-resident AMR rides the slice engine; oversize falls back
    assert csm(scene_amr, d_ok)[0]
    scene_amr_big = scene_amr.replace(
        vol_samples=(jnp.zeros((160, 160, 160), jnp.float32),))
    assert not csm(scene_amr_big, d_ok)[0]


def test_fast_path_instance_transform():
    """A non-identity instance transform routes through inst_minv exactly
    as the arena path does."""
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import (can_slice_march,
                                                 trace_volume,
                                                 trace_volume_fast)

    n, w, h = 16, 16, 16
    vol = wavelet_volume(n)
    m = mat4_translate_scale((3.0, -2.0, 1.0), (2.0, 2.0, 2.0))
    scene = build_volume_scene([vol], [(0, m)])
    c = np.asarray(m[:3, :3]) @ (np.full(3, (n - 1) / 2.0)) + m[:3, 3]
    cam = PerspectiveCamera(
        eye=tuple(c + 8.0 * n), focus=tuple(c), up=(0.0, 0.0, 1.0),
        fov=float(30 * np.pi / 180), film_width=w, film_height=h,
        samples=1, max_depth=1, jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    ok, axis, flip = can_slice_march(scene, rays.direction)
    assert ok
    fb_f = np.asarray(trace_volume_fast(scene, rays, w, h,
                                        axis=axis, flip=flip))
    arena = make_arena(rays, 0)
    fb_m = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8))
    err = np.abs(fb_f[:, :3] - fb_m[:, :3])
    # the scale-2 instance makes |d_obj| = 0.5, so the two discretizations'
    # sample ladders diverge most at silhouette pixels (march: arc steps of
    # step*|d|; slice: fixed planes) — mean stays tight, max is edge noise
    assert err.mean() < 3e-3 and err.max() < 0.2, (err.mean(), err.max())


def test_slab_streaming_matches_single():
    """Forcing tiny slabs (4 rows per window) must match the whole-brick
    dispatch to 1 ulp: same plane positions, same weights, color/w carried
    across windows (XLA fuses the while_loop variant differently)."""
    _, _, _, args, meta = _setup()
    c_k, w_k, f_k = slice_march(*args, interpret=True, **meta)
    c_s, w_s, f_s = slice_march(*args, interpret=True,
                                slab_bytes=16 * 1024, **meta)
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_k), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_k))


def test_multibrick_slice_axes():
    """The slice engine under the wavefront volume tracer (march_round
    slice_axes): a 2-brick scene must agree with the gather-march tracer
    at image tolerance, and AMR bricks in the same scene keep the march
    (slice_axes_for yields None for them)."""
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import (slice_axes_for,
                                                 trace_volume)
    from test_volume_domain import _bricked_wavelet

    n, w, h = 32, 24, 24
    bricks = _bricked_wavelet(n)
    eye = np.eye(4, dtype=np.float32)
    scene = build_volume_scene(bricks, [(0, eye), (1, eye)])
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=w, film_height=h, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    saxes = slice_axes_for(scene, rays.direction)
    assert all(a is not None for a in saxes)
    arena = make_arena(rays, 0)
    fb_m = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8))
    fb_s = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8,
                                   slice_axes=saxes, slice_interpret=True))
    err = np.abs(fb_s[:, :3] - fb_m[:, :3])
    assert err.mean() < 3e-3 and err.max() < 0.06, (err.mean(), err.max())

    # r5: a small AMR volume rides the slice engine too; the slice
    # render must agree with the march at image tolerance
    amr = _bricked_wavelet(n)
    sub = wavelet_volume(8)
    sub.level = 1
    amr[0].subgrids.append(sub)
    scene_amr = build_volume_scene(amr, [(0, eye), (1, eye)])
    saxes_amr = slice_axes_for(scene_amr, rays.direction)
    assert saxes_amr[0] is not None and saxes_amr[1] is not None
    fb_am = np.asarray(trace_volume(scene_amr, arena, w, h, max_rounds=8))
    fb_as = np.asarray(trace_volume(scene_amr, arena, w, h, max_rounds=8,
                                    slice_axes=saxes_amr,
                                    slice_interpret=True))
    err_a = np.abs(fb_as[:, :3] - fb_am[:, :3])
    assert err_a.mean() < 8e-3, err_a.mean()


def test_slice_under_volume_domain():
    """The slice engine inside the SHARDED domain program: per-device
    brick origins/TF ranges ride traced; the 2-brick 2-device render must
    match the gather-march domain render at image tolerance."""
    from jax.sharding import Mesh

    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_tracer import slice_axes_for
    from gravit_tpu.schedule.volume_domain import (partition_volume_scene,
                                                   trace_volume_domain)
    from test_volume_domain import _bricked_wavelet

    n, w, h = 32, 24, 24
    bricks = _bricked_wavelet(n)
    eye = np.eye(4, dtype=np.float32)
    instances = [(0, eye), (1, eye)]
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=w, film_height=h, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    arena = make_arena(rays, 0)
    jmesh = Mesh(np.array(jax.devices()[:2]), ("domains",))
    stacked, owners = partition_volume_scene(bricks, instances, 2)
    saxes = slice_axes_for(stacked, rays.direction)
    assert saxes and all(a is not None for a in saxes), saxes
    fb_m = np.asarray(trace_volume_domain(stacked, owners, arena, w, h,
                                          jmesh, max_rounds=8))
    fb_s = np.asarray(trace_volume_domain(stacked, owners, arena, w, h,
                                          jmesh, max_rounds=8,
                                          slice_axes=saxes,
                                          slice_interpret=True))
    err = np.abs(fb_s[:, :3] - fb_m[:, :3])
    assert err.mean() < 3e-3 and err.max() < 0.06, (err.mean(), err.max())
    assert (fb_s[:, :3].sum(-1) > 0).sum() > 20


def test_rotated_transform_object_space_gate():
    """ADVICE r4 (high): the slice gate must run in OBJECT space. A 90-deg
    rotation about Y maps world-z rays onto the object x-axis; the old
    world-space gate picked axis=2 with |d_obj_z| ~ 0 and rendered the
    volume empty. The object-space gate must pick the dominant OBJECT
    axis and the fast path must then match the gather-march tracer."""
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import (can_slice_march,
                                                 trace_volume,
                                                 trace_volume_fast)

    n, w, h = 16, 16, 16
    vol = wavelet_volume(n)
    # rotate 90 deg about Y: object +x -> world -z, object +z -> world +x
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[0.0, 0.0, 1.0],
                          [0.0, 1.0, 0.0],
                          [-1.0, 0.0, 0.0]], np.float32)
    scene = build_volume_scene([vol], [(0, m)])
    c_obj = np.full(3, (n - 1) / 2.0)
    c = m[:3, :3] @ c_obj + m[:3, 3]
    cam = PerspectiveCamera(
        eye=tuple(c + np.array([0.0, 0.0, 8.0 * n])), focus=tuple(c),
        up=(0.0, 1.0, 0.0), fov=float(30 * np.pi / 180),
        film_width=w, film_height=h, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    ok, axis, flip = can_slice_march(scene, rays.direction)
    assert ok
    assert axis == 0, axis  # dominant OBJECT axis, not the world z
    fb_f = np.asarray(trace_volume_fast(scene, rays, w, h,
                                        axis=axis, flip=flip))
    arena = make_arena(rays, 0)
    fb_m = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8))
    err = np.abs(fb_f[:, :3] - fb_m[:, :3])
    assert err.mean() < 3e-3 and err.max() < 0.06, (err.mean(), err.max())
    assert (fb_f[:, :3].sum(-1) > 0).sum() > 10  # not silently empty


def test_sign_consistency_gate():
    """ADVICE r4 (low): rays whose d_axis sign opposes the flip would
    composite back-to-front on the fixed plane ladder -> gate must refuse
    even though every |d_axis| clears MIN_AXIS_COMPONENT."""
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import can_slice_march

    vol = wavelet_volume(16)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    d = np.tile(np.array([[0.0, 0.0, -1.0]]), (8, 1))
    assert can_slice_march(scene, d)[0]
    d_mixed = np.concatenate([d, np.array([[0.0, 0.0, 1.0]])])
    assert not can_slice_march(scene, d_mixed)[0]


def test_slice_axes_for_short_feature_tuples():
    """ADVICE r4 (low): feature tuples shorter than num_volumes must not
    IndexError (march_round guards with v < len(...); the gate must
    too)."""
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import slice_axes_for
    from test_volume_domain import _bricked_wavelet

    bricks = _bricked_wavelet(32)
    eye = np.eye(4, dtype=np.float32)
    scene = build_volume_scene(bricks, [(0, eye), (1, eye)])
    # len 1 < num_volumes 2 — must not raise; small-brick features all
    # ride the slice engine (r5), oversize bricks gate to the march
    d = np.tile(np.array([[0.0, 0.0, -1.0]]), (8, 1))
    short_sl = scene.replace(vol_slices=(((1.0, 0.0, 0.0, -1.0),),))
    saxes = slice_axes_for(short_sl, d)
    assert saxes[0] is not None and saxes[1] is not None
    short_iso = scene.replace(vol_isovalues=((1.0,),))
    saxes = slice_axes_for(short_iso, d)
    assert saxes[0] is not None and saxes[1] is not None


def test_iso_kernel_matches_reference():
    """Isosurfaces on the slice engine (r5): the Pallas kernel's crossing
    detection, gradient taps and headlight deposit must match the jnp
    twin to ~1 ulp, and the volume-only path must be unchanged."""
    _, _, _, args, meta = _setup()
    o, d, act, c0, w0, S, cl, ol = args
    iso = (float(np.asarray(S).mean()),)
    c_r, w_r, f_r = slice_march_reference(o, d, act, c0, w0, S, cl, ol,
                                          isovalues=iso, **meta)
    c_k, w_k, f_k = slice_march(o, d, act, c0, w0, S, cl, ol,
                                isovalues=iso, interpret=True, **meta)
    assert (np.asarray(w_r) > 0.99).sum() > 50      # crossings actually fire
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_k), np.asarray(f_r))


def test_iso_slice_close_to_march():
    """Slice-engine iso vs the gather march's iso: same surface, different
    sample ladders — crossings land within one plane of each other, so
    agreement is image-level (interior tight; silhouette pixels where one
    ladder grazes the surface and the other misses differ by design)."""
    import jax.numpy as jnp

    vol, cam, rays, args, meta = _setup()
    o, d, act, c0, w0, S, cl, ol = args
    iso = (float(np.asarray(S).mean()),)
    c_s, w_s, _ = slice_march_reference(o, d, act, c0, w0, S, cl, ol,
                                        isovalues=iso, **meta)
    c_m, w_m, _ = march_brick(
        o, d, act, c0, w0, S,
        jnp.asarray(vol.origin), jnp.asarray(vol.spacing),
        jnp.asarray(vol.bounds_min), jnp.asarray(vol.bounds_max),
        cl, ol, jnp.asarray([vol.tf.low, vol.tf.high], jnp.float32),
        float(vol.step_size()), vol.max_steps(), isovalues=iso)
    c_s, w_s, c_m, w_m = map(np.asarray, (c_s, w_s, c_m, w_m))
    ns, nm = (w_s > 0.99).sum(), (w_m > 0.99).sum()
    assert abs(int(ns) - int(nm)) <= max(5, 0.05 * nm), (ns, nm)
    d_ = np.abs(c_s - c_m)
    assert d_.mean() < 8e-3, d_.mean()


def test_trace_volume_fast_iso():
    """The renderer-facing path: an iso volume now qualifies for
    trace_volume_fast (small brick) and must agree with the gather-march
    wavefront tracer at image level."""
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import (can_slice_march,
                                                 trace_volume,
                                                 trace_volume_fast)

    n, w, h = 32, 24, 24
    vol = wavelet_volume(n)
    vol.isovalues = [float(np.asarray(vol.samples).mean())]
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    assert scene.vol_isovalues and scene.vol_isovalues[0]
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=w, film_height=h, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    ok, axis, flip = can_slice_march(scene, rays.direction)
    assert ok
    fb_f = np.asarray(trace_volume_fast(scene, rays, w, h,
                                        axis=axis, flip=flip))
    arena = make_arena(rays, 0)
    fb_m = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8))
    err = np.abs(fb_f[:, :3] - fb_m[:, :3])
    assert err.mean() < 8e-3, err.mean()
    assert (fb_f[:, :3].sum(-1) > 0).sum() > 20


def test_slab_grid_kernel_matches_single():
    """The single-dispatch slab-GRID kernel (r5: slabs on the outer grid
    dim, windows pipelined, aliased color/w carry) must match the
    whole-brick dispatch to 1 ulp. Needs nb >= 4 ray blocks to engage
    (4096 rays); forcing 4-row windows makes 31 slabs at 32^3."""
    import jax.numpy as jnp

    from gravit_tpu.scene.camera import PerspectiveCamera

    n = 32
    vol = wavelet_volume(n)
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=64, film_height=64, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    N = rays.origin.shape[0]
    assert N // 1024 >= 4
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
    c_k, w_k, f_k = slice_march(*args, interpret=True, **meta)
    c_s, w_s, f_s = slice_march(*args, interpret=True,
                                slab_bytes=16 * 1024, **meta)
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_k), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_k))


def test_slice_planes_on_slice_engine():
    """Slice-plane features on the slice engine (r5, completing the
    feature sweep): twin and kernel agree to 1 ulp; the slice render
    agrees with the gather march at image level through the
    renderer-facing path; all three features compose."""
    import jax.numpy as jnp

    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.render.volume_scene import build_volume_scene
    from gravit_tpu.render.volume_tracer import (can_slice_march,
                                                 trace_volume,
                                                 trace_volume_fast)

    n, w, h = 32, 24, 24
    vol = wavelet_volume(n)
    vol.slices = [(1.0, 0.2, 0.1, -18.0)]
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    assert scene.vol_slices and scene.vol_slices[0]
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n), focus=((n - 1) / 2,) * 3,
        up=(0.0, 0.0, 1.0), fov=float(30 * np.pi / 180),
        film_width=w, film_height=h, samples=1, max_depth=1,
        jitter_window=0.0)
    rays = cam.generate_rays(volume=True)
    ok, axis, flip = can_slice_march(scene, rays.direction)
    assert ok
    fb_f = np.asarray(trace_volume_fast(scene, rays, w, h,
                                        axis=axis, flip=flip))
    arena = make_arena(rays, 0)
    fb_m = np.asarray(trace_volume(scene, arena, w, h, max_rounds=8))
    err = np.abs(fb_f[:, :3] - fb_m[:, :3])
    assert err.mean() < 8e-3, err.mean()
    assert (fb_f[:, :3].sum(-1) > 0).sum() > 20
