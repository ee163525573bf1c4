"""Flax SAM decoder vs transformers.SamModel (random init from config — no
weight downloads; the vision encoder is bypassed via precomputed image
embeddings, exactly how the decoder is driven in serving)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from deva_tpu.ext.sam_decoder import (SamDecoder, SamDecoderConfig,
                                      convert_sam_decoder_statedict)


@pytest.fixture(scope="module")
def hf_and_flax():
    from transformers import SamConfig, SamModel
    torch.manual_seed(0)
    cfg = SamConfig()
    # tiny vision encoder: its weights are unused (we feed embeddings), but
    # construction is faster
    cfg.vision_config.num_hidden_layers = 1
    cfg.vision_config.hidden_size = 32
    cfg.vision_config.num_attention_heads = 2
    model = SamModel(cfg).eval()
    variables = convert_sam_decoder_statedict(model.state_dict())
    return model, SamDecoder(SamDecoderConfig()), variables


def _embeddings(rng):
    return rng.standard_normal((1, 256, 64, 64)).astype(np.float32) * 0.5


def test_box_prompts_match(hf_and_flax):
    model, dec, variables = hf_and_flax
    rng = np.random.default_rng(0)
    emb = _embeddings(rng)
    boxes = np.array([[[100.0, 150.0, 500.0, 600.0],
                       [10.0, 20.0, 200.0, 300.0]]], np.float32)

    with torch.no_grad():
        out = model(image_embeddings=torch.from_numpy(emb),
                    input_boxes=torch.from_numpy(boxes),
                    multimask_output=True)
    want_m = out.pred_masks.numpy()
    want_iou = out.iou_scores.numpy()

    emb_nhwc = jnp.asarray(np.moveaxis(emb, 1, -1))
    got_m, got_iou = dec.apply(variables, emb_nhwc,
                               boxes=jnp.asarray(boxes),
                               multimask_output=True)
    assert got_m.shape == want_m.shape == (1, 2, 3, 256, 256)
    np.testing.assert_allclose(np.asarray(got_m), want_m,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou,
                               rtol=1e-3, atol=1e-4)


def test_point_prompts_match(hf_and_flax):
    model, dec, variables = hf_and_flax
    rng = np.random.default_rng(1)
    emb = _embeddings(rng)
    points = np.array([[[[320.0, 240.0], [600.0, 700.0]],
                        [[100.0, 900.0], [40.0, 80.0]]]], np.float32)
    labels = np.array([[[1, 0], [1, -1]]], np.float32)

    with torch.no_grad():
        out = model(image_embeddings=torch.from_numpy(emb),
                    input_points=torch.from_numpy(points),
                    input_labels=torch.from_numpy(labels).long(),
                    multimask_output=True)
    want_m = out.pred_masks.numpy()

    emb_nhwc = jnp.asarray(np.moveaxis(emb, 1, -1))
    got_m, got_iou = dec.apply(variables, emb_nhwc,
                               points=jnp.asarray(points),
                               labels=jnp.asarray(labels),
                               multimask_output=True)
    assert got_m.shape == want_m.shape
    np.testing.assert_allclose(np.asarray(got_m), want_m,
                               rtol=2e-3, atol=2e-3)
