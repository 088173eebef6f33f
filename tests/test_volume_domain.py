"""Volume domain scheduler: bricks sharded over 2/4 devices must match the
single-device multi-brick render (rays carry opacity across the wire)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gravit_tpu.render.tracer import make_arena
from gravit_tpu.render.volume_scene import build_volume_scene
from gravit_tpu.render.volume_tracer import trace_volume
from gravit_tpu.schedule.volume_domain import (partition_volume_scene,
                                               trace_volume_domain)
from gravit_tpu.scene.camera import PerspectiveCamera
from gravit_tpu.scene.volume import Volume, wavelet_volume


def _bricked_wavelet(n=32):
    full = wavelet_volume(n)
    s = full.samples
    tf = full.tf
    half = n // 2
    bricks = [
        Volume(samples=s[:, :, :half + 1].copy(),
               origin=np.array([0, 0, 0], np.float32),
               spacing=np.ones(3, np.float32), tf=tf),
        # pad the right brick to the left brick's shape by duplicating the
        # last sample plane (keeps brick shapes uniform for sharding)
        Volume(samples=np.concatenate(
                   [s[:, :, half:], s[:, :, -1:]], axis=2).copy(),
               origin=np.array([half, 0, 0], np.float32),
               spacing=np.ones(3, np.float32), tf=tf),
    ]
    return bricks


@pytest.mark.parametrize("n_dev", [2, 4])
def test_volume_domain_matches_single(n_dev):
    n = 32
    bricks = _bricked_wavelet(n)
    eye = np.eye(4, dtype=np.float32)
    instances = [(0, eye), (1, eye)]
    cam = PerspectiveCamera(
        eye=(4.0 * n, 4.0 * n, 4.0 * n),
        focus=((n - 1) / 2,) * 3, up=(0.0, 0.0, 1.0),
        fov=float(30 * np.pi / 180), film_width=24, film_height=24)

    scene1 = build_volume_scene(bricks, instances)
    arena = make_arena(cam.generate_rays(volume=True), 0)
    fb1 = np.asarray(trace_volume(scene1, arena, 24, 24, max_rounds=8))

    devs = np.array(jax.devices()[:n_dev]).reshape(n_dev)
    mesh = Mesh(devs, ("domains",))
    stacked, owners = partition_volume_scene(bricks, instances, n_dev)
    fb2 = np.asarray(trace_volume_domain(stacked, owners, arena, 24, 24,
                                         mesh, max_rounds=8))
    err = np.abs(fb1[:, :3] - fb2[:, :3]).max()
    assert err < 1e-5, f"volume domain scheduling changed image by {err}"
    assert (fb2[:, :3].sum(-1) > 0).sum() > 50
