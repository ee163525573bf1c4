"""End-to-end differential test: deva_tpu InferenceCore vs the reference
DEVAInferenceCore on a synthetic multi-frame video with identical (converted)
random weights.

Covers the full recurrent stack: feature cache, memory ring appends, top-k
readout, sensory GRU feedback, decoder, aggregation, mid-stream object
insertion, and long-term consolidation.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork

from helpers_ref import build_reference_deva, converted_variables

H, W = 64, 96


def _synthetic_video(rng, t=8):
    """Smooth random frames + a moving-squares ground-truth first-frame mask."""
    frames = []
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    for i in range(t):
        img = base + 0.1 * rng.standard_normal((H // 8, W // 8, 3))
        img = np.kron(img, np.ones((8, 8, 1))).astype(np.float32)
        frames.append(img)
    mask0 = np.zeros((H, W), np.int64)
    mask0[8:28, 10:40] = 1
    mask0[36:60, 50:90] = 2
    mask_mid = np.zeros((H, W), np.int64)
    mask_mid[4:20, 60:88] = 3
    return frames, mask0, mask_mid


def _ref_config(**over):
    cfg = {
        "pix_feat_dim": 512,
        "key_dim": 64,
        "value_dim": 512,
        "mem_every": 2,
        "top_k": 8,
        "chunk_size": -1,
        "enable_long_term": False,
        "enable_long_term_count_usage": False,
        "max_mid_term_frames": 3,
        "min_mid_term_frames": 1,
        "num_prototypes": 16,
        "max_long_term_elements": 96,
    }
    cfg.update(over)
    return cfg


def _our_config(ref_cfg) -> InferenceConfig:
    return InferenceConfig(
        mem_every=ref_cfg["mem_every"],
        top_k=ref_cfg["top_k"],
        enable_long_term=ref_cfg["enable_long_term"],
        enable_long_term_count_usage=ref_cfg["enable_long_term_count_usage"],
        max_mid_term_frames=ref_cfg["max_mid_term_frames"],
        min_mid_term_frames=ref_cfg["min_mid_term_frames"],
        num_prototypes=ref_cfg["num_prototypes"],
        max_long_term_elements=ref_cfg["max_long_term_elements"],
    )


@pytest.fixture(scope="module")
def setup():
    ref_net = build_reference_deva(seed=0)
    variables = converted_variables(ref_net)
    model = DEVANetwork(ModelConfig())
    return ref_net, model, variables


def _run_both(setup, ref_cfg, frames, mask0, mask_mid=None, mid_frame=4):
    from deva.inference.inference_core import DEVAInferenceCore
    ref_net, model, variables = setup

    ref_core = DEVAInferenceCore(ref_net, config=ref_cfg)
    our_core = InferenceCore(model, variables, _our_config(ref_cfg))

    ref_probs, our_probs = [], []
    with torch.no_grad():
        for ti, img in enumerate(frames):
            t_img = torch.from_numpy(np.moveaxis(img, -1, 0)).contiguous()
            j_img = jnp.asarray(img)
            if ti == 0:
                rp = ref_core.step(t_img, torch.from_numpy(mask0),
                                   objects=[1, 2])
                op = our_core.step(j_img, mask0, objects=[1, 2])
            elif mask_mid is not None and ti == mid_frame:
                rp = ref_core.step(t_img, torch.from_numpy(mask_mid),
                                   objects=[3])
                op = our_core.step(j_img, mask_mid, objects=[3])
            else:
                rp = ref_core.step(t_img)
                op = our_core.step(j_img)
            ref_probs.append(rp.numpy())
            our_probs.append(np.asarray(op))
    return ref_probs, our_probs


def _compare(ref_probs, our_probs, atol):
    for ti, (r, o) in enumerate(zip(ref_probs, our_probs)):
        assert r.shape == o.shape, (ti, r.shape, o.shape)
        np.testing.assert_allclose(o, r, atol=atol,
                                   err_msg=f"frame {ti}")
        # argmax must agree except at near-ties (float-noise flips)
        diff = o.argmax(0) != r.argmax(0)
        top2 = np.sort(r, axis=0)[-2:]
        margin = top2[1] - top2[0]
        bad = diff & (margin > 5 * atol)
        assert not bad.any(), (
            f"argmax frame {ti}: {int(bad.sum())} confident mismatches")


def test_vos_propagation_parity(setup):
    """Pure propagation from a first-frame mask (the eval_vos path)."""
    rng = np.random.default_rng(7)
    frames, mask0, _ = _synthetic_video(rng, t=6)
    ref_probs, our_probs = _run_both(setup, _ref_config(), frames, mask0)
    _compare(ref_probs, our_probs, atol=2e-3)


def test_vos_midstream_object_insertion(setup):
    """A new object arrives mid-video via a partial mask (YouTubeVOS path,
    exercises the predicted/provided mask merge and a second memory bucket)."""
    rng = np.random.default_rng(8)
    frames, mask0, mask_mid = _synthetic_video(rng, t=7)
    ref_probs, our_probs = _run_both(setup, _ref_config(), frames, mask0,
                                     mask_mid=mask_mid, mid_frame=3)
    _compare(ref_probs, our_probs, atol=2e-3)


def test_vos_long_term_consolidation_parity(setup):
    """Tiny T_max forces consolidation into long-term memory + usage counting.
    reference:deva/inference/memory_manager.py:207-276."""
    rng = np.random.default_rng(9)
    frames, mask0, _ = _synthetic_video(rng, t=10)
    cfg = _ref_config(enable_long_term=True,
                      enable_long_term_count_usage=True,
                      mem_every=1, max_mid_term_frames=4,
                      min_mid_term_frames=2, num_prototypes=16)
    ref_probs, our_probs = _run_both(setup, cfg, frames, mask0)
    _compare(ref_probs, our_probs, atol=5e-3)
