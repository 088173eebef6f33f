"""API surface tests: the SimpleApp scene driven through gravit_tpu.api
must match the directly-built scene, for both schedulers."""

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "examples"))

import scenes
from gravit_tpu import api
from gravit_tpu.render.renderer import Renderer
from gravit_tpu.render.tracer import make_arena, trace_image


def _reference_fb(w, h):
    scene, cam = scenes.simple_scene(w, h)
    cam.jitter_mode = "current"  # api path uses current reference semantics
    arena = make_arena(cam.generate_rays(), scene.num_lights)
    return np.asarray(trace_image(scene, arena, w, h, max_rounds=32))


def test_api_simple_image_scheduler(tmp_path):
    import simple_app

    Renderer.reset()
    simple_app.build_scene(int(api.Schedule.Image), wsize=(32, 32))
    api.render("Enzoschedule")
    fb = np.asarray(Renderer.instance().framebuffer("Enzoschedule"))
    ref = _reference_fb(32, 32)
    assert np.abs(fb - ref).max() < 1e-6
    out = tmp_path / "simple"
    path = api.writeimage("Enzoschedule", str(out))
    from gravit_tpu.scene.image import read_ppm
    img = read_ppm(str(out) + ".ppm")
    assert img.shape == (32, 32, 3)
    assert img.sum() > 0


def test_api_simple_domain_scheduler():
    import simple_app

    Renderer.reset()
    simple_app.build_scene(int(api.Schedule.Domain), wsize=(32, 32))
    api.render("Enzoschedule")
    fb = np.asarray(Renderer.instance().framebuffer("Enzoschedule"))
    ref = _reference_fb(32, 32)
    assert np.abs(fb - ref).max() < 1e-5


def test_api_volume_render():
    from gravit_tpu.scene.volume import wavelet_volume

    Renderer.reset()
    api.gvtInit()
    vol = wavelet_volume(16)
    flat = np.transpose(vol.samples, (0, 1, 2)).reshape(-1)  # z-major flat
    # api expects x-fastest flat layout: samples[i + nx*(j + ny*k)]
    api.createVolume("vol")
    node = api._db().find("vol")
    node["tf"] = vol.tf
    api.addVolumeSamples("vol", flat, [16, 16, 16], [0.0, 0.0, 0.0],
                         [1.0, 1.0, 1.0], 1.0)
    api.addInstance("inst0", "vol", np.eye(4, dtype=np.float32).flatten())
    api.addCamera("cam", [64.0, 64.0, 64.0], [7.5, 7.5, 7.5],
                  [0.0, 0.0, 1.0], 30 * np.pi / 180, 1, 1, 0.5)
    api.addFilm("film", 16, 16, "vol_out")
    api.addRenderer("vr", int(api.Adapter.Pvol), int(api.Schedule.Domain),
                    "cam", "film", volume=True)
    api.render("vr")
    fb = np.asarray(Renderer.instance().framebuffer("vr"))
    assert np.isfinite(fb).all()
    assert fb[:, :3].sum() > 0


def test_api_volume_domain_multidevice():
    """Volume Domain schedule through the api on 8 virtual devices."""
    import jax
    from gravit_tpu.scene.volume import wavelet_volume
    from gravit_tpu.scene.volume import Volume

    if len(jax.devices()) < 2:
        return
    Renderer.reset()
    api.gvtInit()
    full = wavelet_volume(32)
    s = full.samples
    half = 16
    left = s[:, :, :half + 1]
    right = np.concatenate([s[:, :, half:], s[:, :, -1:]], axis=2)
    for i, (brick, ox) in enumerate([(left, 0.0), (right, 16.0)]):
        name = f"b{i}"
        api.createVolume(name)
        api._db().find(name)["tf"] = full.tf
        api.addVolumeSamples(name, brick.reshape(-1),
                             [brick.shape[2], brick.shape[1],
                              brick.shape[0]],
                             [ox, 0.0, 0.0], [1.0, 1.0, 1.0], 1.0)
        api.addInstance(f"i{i}", name, np.eye(4, dtype=np.float32).flatten())
    api.addCamera("cam", [128.0, 128.0, 128.0], [15.5, 15.5, 15.5],
                  [0.0, 0.0, 1.0], 30 * np.pi / 180, 1, 1, 0.5)
    api.addFilm("film", 24, 24, "out")
    api.addRenderer("vr", int(api.Adapter.Pvol), int(api.Schedule.Domain),
                    "cam", "film", volume=True)
    api.render("vr")
    fb = np.asarray(Renderer.instance().framebuffer("vr"))
    assert np.isfinite(fb).all()
    assert fb[:, :3].sum() > 0
