"""ResultSaver device fast path: argmax ids pulled from the device must
produce byte-identical PNGs to the host-side prob->argmax path."""
import os

import numpy as np
import pytest

import jax.numpy as jnp
from PIL import Image

from deva_tpu.inference.object_info import ObjectInfo
from deva_tpu.inference.object_manager import ObjectManager
from deva_tpu.inference.result_saver import ResultSaver, device_argmax_ids


def test_device_argmax_matches_numpy():
    rng = np.random.default_rng(0)
    prob = rng.uniform(0, 1, (5, 33, 47)).astype(np.float32)
    # exact ties: both np.argmax and jnp.argmax pick the first maximum
    prob[1, :4, :4] = prob[0, :4, :4]
    ids = device_argmax_ids(jnp.asarray(prob))
    assert ids.dtype == np.uint8
    np.testing.assert_array_equal(ids, np.argmax(prob, axis=0))


def test_device_argmax_many_channels_dtype():
    prob = np.zeros((300, 4, 4), np.float32)
    prob[257, 1, 1] = 1.0
    ids = device_argmax_ids(jnp.asarray(prob))
    assert ids.dtype == np.int32
    assert ids[1, 1] == 257


def _save_and_read(tmp_path, sub, prob):
    om = ObjectManager()
    om.add_new_objects([ObjectInfo(1), ObjectInfo(2)])
    saver = ResultSaver(str(tmp_path / sub), "vid", dataset="unsup_davis17",
                        object_manager=om,
                        palette=bytes([0, 0, 0, 128, 0, 0, 0, 128, 0]
                                      + [0] * 759))
    saver.save_mask(prob, "00000.png")
    saver.end()
    out = tmp_path / sub / "vid" / "00000.png"
    return np.asarray(Image.open(out))


def test_saver_device_path_identical_png(tmp_path):
    rng = np.random.default_rng(1)
    prob = rng.uniform(0, 1, (3, 24, 32)).astype(np.float32)
    a = _save_and_read(tmp_path, "host", prob)
    b = _save_and_read(tmp_path, "dev", jnp.asarray(prob))
    np.testing.assert_array_equal(a, b)


def test_worker_error_surfaces_and_does_not_wedge(tmp_path, monkeypatch):
    """A failing save must raise on the caller thread (at end() or a later
    save_mask) rather than kill the worker: a dead consumer would fill the
    bounded queue and deadlock the driver on queue.join()."""
    from deva_tpu.inference import result_saver as rs

    calls = []

    def boom(args):
        calls.append(args.frame_name)
        raise OSError("disk full")

    monkeypatch.setattr(rs, "_save_one", boom)
    om = ObjectManager()
    om.add_new_objects([ObjectInfo(1)])
    saver = ResultSaver(str(tmp_path), "vid", dataset="unsup_davis17",
                        object_manager=om)
    prob = np.zeros((2, 8, 8), np.float32)
    saver.save_mask(prob, "00000.png")
    # the worker must keep draining: 15 more puts > queue maxsize (10)
    # would deadlock here if the worker died on the first error
    with pytest.raises(RuntimeError, match="disk full"):
        for i in range(1, 16):
            saver.save_mask(prob, f"{i:05d}.png")
        saver.end()
    assert calls  # the failing item was actually processed
