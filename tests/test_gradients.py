"""Differentiable-rendering gradient checks vs finite differences — the
acceptance criterion the reference cannot meet (BASELINE.json north star).

Gradients are checked at fixed topology (hit assignments unchanged by the
perturbation): material/light parameters are smooth everywhere; vertex
gradients are checked with a perturbation small enough not to flip any
hit/miss decision.
"""

import jax
import jax.numpy as jnp
import numpy as np

import scenes
from gravit_tpu.render.scene_build import refresh_geometry
from gravit_tpu.render.tracer import make_arena
from gravit_tpu.render.train import (TrainParams, loss_fn, make_train_step,
                                     params_from_scene)
from gravit_tpu.render.volume_scene import build_volume_scene
from gravit_tpu.render.volume_tracer import trace_volume
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.volume import wavelet_volume


def _setup(w=16, h=16):
    scene, cam = scenes.simple_scene(w, h)
    arena = make_arena(cam.generate_rays(), scene.num_lights)
    p = params_from_scene(scene)
    key = jax.random.key(3)
    target = jax.random.uniform(key, (w * h, 4))
    return scene, arena, p, target, w, h


def _fd_check(f, p, dp, rtol=0.15):
    """Directional derivative of f at p along dp vs central differences."""
    eps = 3e-3
    g = jax.grad(f)(p)
    analytic = sum(jnp.vdot(ga, da) for ga, da in
                   zip(jax.tree.leaves(g), jax.tree.leaves(dp)))
    plus = jax.tree.map(lambda a, d: a + eps * d, p, dp)
    minus = jax.tree.map(lambda a, d: a - eps * d, p, dp)
    fd = (f(plus) - f(minus)) / (2 * eps)
    assert np.isfinite(float(analytic)) and np.isfinite(float(fd))
    np.testing.assert_allclose(float(analytic), float(fd), rtol=rtol,
                               atol=1e-6)
    return float(analytic)


def test_grad_kd_matches_fd():
    scene, arena, p, target, w, h = _setup()

    def f(p):
        return loss_fn(p, scene, arena, target, w, h, rounds=3)

    key = jax.random.key(0)
    dp = TrainParams(
        vertices=jnp.zeros_like(p.vertices),
        kd=jax.random.normal(key, p.kd.shape),
        light_pos=jnp.zeros_like(p.light_pos),
        light_color=jnp.zeros_like(p.light_color))
    g = _fd_check(f, p, dp)
    assert abs(g) > 1e-8, "kd gradient unexpectedly zero"


def test_grad_light_matches_fd():
    scene, arena, p, target, w, h = _setup()

    def f(p):
        return loss_fn(p, scene, arena, target, w, h, rounds=3)

    key = jax.random.key(1)
    dp = TrainParams(
        vertices=jnp.zeros_like(p.vertices),
        kd=jnp.zeros_like(p.kd),
        light_pos=jax.random.normal(key, p.light_pos.shape),
        light_color=jax.random.normal(jax.random.key(2),
                                      p.light_color.shape))
    g = _fd_check(f, p, dp)
    assert abs(g) > 1e-8


def test_grad_vertices_matches_fd():
    scene, arena, p, target, w, h = _setup()

    def f(p):
        return loss_fn(p, scene, arena, target, w, h, rounds=3)

    # small smooth perturbation field to stay at fixed topology
    key = jax.random.key(7)
    dv = jax.random.normal(key, p.vertices.shape) * 0.05
    dp = TrainParams(vertices=dv, kd=jnp.zeros_like(p.kd),
                     light_pos=jnp.zeros_like(p.light_pos),
                     light_color=jnp.zeros_like(p.light_color))
    g = _fd_check(f, p, dp, rtol=0.3)
    assert abs(g) > 1e-10


def test_train_step_reduces_loss():
    scene, arena, p, target, w, h = _setup()
    # target = rendering with brighter light; recover it by optimization
    bright = p._replace(light_color=p.light_color * 0.3)
    from gravit_tpu.render.train import render_with_params
    target_fb = render_with_params(scene, p, arena, w, h, rounds=3)

    import optax
    step, opt = make_train_step(optimizer=optax.adam(5e-2), rounds=3,
                                width=w, height=h)
    q = bright
    opt_state = opt.init(q)
    losses = []
    for _ in range(25):
        q, opt_state, loss = step(q, opt_state, scene, arena, target_fb)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.66, losses


def test_volume_grad_wrt_samples():
    vol = wavelet_volume(12)
    scene = build_volume_scene([vol], [(0, np.eye(4, dtype=np.float32))])
    cam = PerspectiveCamera(eye=(48.0, 48.0, 48.0), focus=(5.5, 5.5, 5.5),
                            up=(0.0, 0.0, 1.0), fov=np.pi / 6,
                            film_width=8, film_height=8)
    arena = make_arena(cam.generate_rays(volume=True), 0)

    def f(samples):
        s2 = scene.replace(vol_samples=(samples,))
        fb = trace_volume(s2, arena, 8, 8, max_rounds=4, unroll=True)
        return jnp.sum(fb[:, :3])

    s = scene.vol_samples[0]
    g = jax.grad(f)(s)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0, "volume sample gradients are zero"
    # directional FD
    key = jax.random.key(0)
    d = jax.random.normal(key, s.shape)
    eps = 1e-2
    fd = (f(s + eps * d) - f(s - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, d)), float(fd), rtol=0.1)


def test_slice_march_reference_grads():
    """The slice engine's jnp twin is the differentiable volume fast
    path: gradients of the image wrt brick samples AND the TF LUTs match
    central finite differences."""
    from gravit_tpu.ops.slice_march import (choose_slice_axis,
                                            slice_march_reference)

    n = 12
    vol = wavelet_volume(n)
    cam = PerspectiveCamera(eye=(4.0 * n,) * 3,
                            focus=((n - 1) / 2,) * 3,
                            up=(0.0, 0.0, 1.0), fov=np.pi / 6,
                            film_width=8, film_height=8)
    rays = cam.generate_rays(volume=True)
    N = rays.origin.shape[0]
    axis, flip = choose_slice_axis(np.asarray(rays.direction).mean(0))
    meta = dict(axis=axis, flip=flip, step=float(vol.step_size()),
                base_step=float(vol.spacing.min()),
                low=float(vol.tf.low), high=float(vol.tf.high),
                origin=tuple(float(x) for x in vol.origin),
                spacing=tuple(float(x) for x in vol.spacing))
    S0 = jnp.asarray(vol.samples)
    cl0 = jnp.asarray(vol.tf.color_lut)
    ol = jnp.asarray(vol.tf.opacity_lut)

    def f(S, cl):
        c, w, _ = slice_march_reference(
            rays.origin, rays.direction, jnp.ones((N,), bool),
            jnp.zeros((N, 3)), jnp.zeros((N,)), S, cl, ol, **meta)
        return jnp.sum(c * w[:, None])

    g_s, g_c = jax.grad(f, argnums=(0, 1))(S0, cl0)
    assert np.isfinite(np.asarray(g_s)).all()
    assert float(jnp.abs(g_s).sum()) > 0 and float(jnp.abs(g_c).sum()) > 0
    key = jax.random.key(3)
    dS = jax.random.normal(key, S0.shape)
    eps = 1e-2
    fd = (f(S0 + eps * dS, cl0) - f(S0 - eps * dS, cl0)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g_s, dS)), float(fd),
                               rtol=0.1)
    dC = jax.random.normal(jax.random.key(4), cl0.shape)
    fdc = (f(S0, cl0 + eps * dC) - f(S0, cl0 - eps * dC)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g_c, dC)), float(fdc),
                               rtol=0.1)
