"""Checkpoint/restore round-trip + BOV reader."""

import numpy as np
import optax

import scenes
from gravit_tpu.render import checkpoint
from gravit_tpu.render.train import params_from_scene
from gravit_tpu.scene.readers.bov import read_bov, read_bov_header


def test_checkpoint_roundtrip(tmp_path):
    scene, _ = scenes.simple_scene(8, 8)
    p = params_from_scene(scene)
    opt = optax.adam(1e-3)
    st = opt.init(p)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, p, st, step=7)
    p2, st2, step = checkpoint.restore(path, (p, st, 0))
    assert step == 7
    np.testing.assert_allclose(np.asarray(p.vertices),
                               np.asarray(p2.vertices))
    for a, b in zip(
            __import__("jax").tree.leaves(st),
            __import__("jax").tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_bov_reader(tmp_path):
    data = np.arange(4 * 4 * 4, dtype=np.float32)
    data.tofile(tmp_path / "cube.raw")
    (tmp_path / "cube.bov").write_text(
        "TIME: 1.0\nDATA_FILE: cube.raw\nDATA_SIZE: 4 4 4\n"
        "DATA_FORMAT: FLOAT\nVARIABLE: v\nDATA_ENDIAN: LITTLE\n"
        "DIVIDE_BRICK: true\nDATA_BRICKLETS: 2 2 2\n")
    hdr = read_bov_header(str(tmp_path / "cube.bov"))
    assert hdr.size == (4, 4, 4) and hdr.divide
    bricks = read_bov(str(tmp_path / "cube.bov"))
    assert len(bricks) == 8
    # interior brick gets the +1 shared boundary layer
    assert bricks[0].samples.shape == (3, 3, 3)
    # last brick is clamped at the domain edge
    assert bricks[-1].samples.shape == (2, 2, 2)
    # values preserved (x-fastest layout)
    np.testing.assert_allclose(bricks[0].samples[0, 0, 0], 0.0)
    np.testing.assert_allclose(bricks[-1].samples[-1, -1, -1], 63.0)
