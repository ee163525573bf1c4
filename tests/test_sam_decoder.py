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


# --------------------------------------------------------------------------
# HQ decoder (Light-HQ-SAM): flax vs transformers.SamHQModel
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_and_flax_hq():
    """Random-init SamHQ with the Light-HQ-SAM vit_dim=160
    (reference:deva/ext/LightHQSAM/setup_light_hqsam.py:29-41)."""
    from transformers import SamHQConfig, SamHQModel
    torch.manual_seed(1)
    cfg = SamHQConfig()
    cfg.vision_config.num_hidden_layers = 1
    cfg.vision_config.hidden_size = 32
    cfg.vision_config.num_attention_heads = 2
    cfg.mask_decoder_config.vit_dim = 160
    model = SamHQModel(cfg).eval()
    variables = convert_sam_decoder_statedict(model.state_dict())
    return model, SamDecoder(SamDecoderConfig(hq=True, vit_dim=160)), variables


def _hq_oracle(model, emb, interm, *, boxes=None, points=None, labels=None,
               multimask_output=True, hq_token_only=False):
    """Torch oracle built from the HF SamHQ SUBMODULES (prompt encoder,
    two-way transformer, upscaling convs, HQ fusion convs, hyper MLPs —
    all HF weights/math) glued per the ORIGINAL SAM-HQ decoder flow.

    transformers 4.57's SamHQMaskDecoder.forward itself deviates from the
    original sam-hq: it unpacks the transformer's updated keys into a
    variable it immediately overwrites (`point_embedding, iou_token_out =
    self.transformer(...)`) and then upscales the PRE-transformer image
    embedding spatially transposed (`image_embeddings.transpose(2, 3)`),
    where the original uses the transformer-updated keys
    (sam-hq MaskDecoderHQ.predict_masks: `hs, src = self.transformer(...);
    src = src.transpose(1, 2).view(b, c, h, w)`). deva_tpu follows the
    original (checkpoint-faithful) semantics, so the oracle does too."""
    md = model.mask_decoder
    with torch.no_grad():
        if points is not None:
            points_t = torch.from_numpy(points)
            labels_t = torch.from_numpy(labels).long()
        else:
            points_t = labels_t = None
        boxes_t = torch.from_numpy(boxes) if boxes is not None else None
        sparse, dense = model.prompt_encoder(
            input_points=points_t, input_labels=labels_t,
            input_boxes=boxes_t, input_masks=None)
        image_pe = model.get_image_wide_positional_embeddings()

        emb_t = torch.from_numpy(emb)
        vit_features = torch.from_numpy(interm).permute(0, 3, 1, 2)
        b, ch, h, w = emb_t.shape
        p = sparse.shape[1]

        embed_encode = md.encoder_conv1(emb_t)
        embed_encode = md.activation(md.encoder_norm(embed_encode))
        embed_encode = md.encoder_conv2(embed_encode)
        cvf = md.compress_vit_conv1(vit_features)
        cvf = md.activation(md.compress_vit_norm(cvf))
        cvf = md.compress_vit_conv2(cvf)
        hq_features = embed_encode + cvf

        output_tokens = torch.cat([md.iou_token.weight, md.mask_tokens.weight,
                                   md.hq_token.weight], dim=0)
        tokens = torch.cat([output_tokens.repeat(b, p, 1, 1),
                            sparse], dim=2)
        img = (emb_t + dense).repeat_interleave(p, 0)
        pe = image_pe.repeat_interleave(p, 0)
        queries, keys = md.transformer(
            point_embeddings=tokens, image_embeddings=img,
            image_positional_embeddings=pe, attention_similarity=None)
        iou_token_out = queries[:, :, 0, :]
        mask_tokens_out = queries[:, :, 1:1 + md.num_mask_tokens, :]

        # original flow: upscale the UPDATED keys
        src = keys.transpose(2, 3).reshape(b * p, ch, h, w)
        up = md.upscale_conv1(src)
        up = md.activation(md.upscale_layer_norm(up))
        up = md.activation(md.upscale_conv2(up))
        up_hq = md.mask_conv1(up)
        up_hq = md.activation(md.mask_norm(up_hq))
        up_hq = md.mask_conv2(up_hq) + hq_features.repeat_interleave(p, 0)

        hyper = []
        for i in range(md.num_mask_tokens):
            mlp = md.output_hypernetworks_mlps[i] \
                if i < md.num_mask_tokens - 1 else md.hq_mask_mlp
            hyper.append(mlp(mask_tokens_out[:, :, i, :]))
        hyper = torch.stack(hyper, dim=2)
        _, c8, hh, ww = up.shape
        up = up.reshape(b, p, c8, hh * ww)
        up_hq = up_hq.reshape(b, p, c8, hh * ww)
        masks_sam = (hyper[:, :, :md.num_mask_tokens - 1] @ up).reshape(
            b, p, -1, hh, ww)
        masks_hq = (hyper[:, :, md.num_mask_tokens - 1:] @ up_hq).reshape(
            b, p, -1, hh, ww)
        iou_pred = md.iou_prediction_head(iou_token_out)
        if multimask_output:
            iou_mm = iou_pred[:, :, 1:md.num_mask_tokens - 1]
            iou_sorted, order = torch.sort(iou_mm, dim=2, descending=True)
            mm = masks_sam[:, :, 1:]
            mm = torch.gather(mm, 2, order[..., None, None].expand(
                -1, -1, -1, mm.shape[3], mm.shape[4]))
            iou_out = iou_sorted
        else:
            mm = masks_sam[:, :, 0:1]
            iou_out = iou_pred[:, :, 0:1]
        out = masks_hq if hq_token_only else mm + masks_hq
        return out.numpy(), iou_out.numpy()


@pytest.mark.parametrize("hq_token_only", [False, True])
def test_hq_box_prompts_match(hf_and_flax_hq, hq_token_only):
    model, dec, variables = hf_and_flax_hq
    rng = np.random.default_rng(2)
    emb = _embeddings(rng)
    interm = rng.standard_normal((1, 64, 64, 160)).astype(np.float32) * 0.5
    boxes = np.array([[[100.0, 150.0, 500.0, 600.0],
                       [10.0, 20.0, 200.0, 300.0]]], np.float32)

    want_m, want_iou = _hq_oracle(model, emb, interm, boxes=boxes,
                                  multimask_output=True,
                                  hq_token_only=hq_token_only)

    emb_nhwc = jnp.asarray(np.moveaxis(emb, 1, -1))
    got_m, got_iou = dec.apply(variables, emb_nhwc,
                               boxes=jnp.asarray(boxes),
                               intermediate_embeddings=jnp.asarray(interm),
                               multimask_output=True,
                               hq_token_only=hq_token_only)
    assert got_m.shape == want_m.shape
    np.testing.assert_allclose(np.asarray(got_m), want_m,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou,
                               rtol=1e-3, atol=1e-4)


def test_hq_single_mask_output_match(hf_and_flax_hq):
    model, dec, variables = hf_and_flax_hq
    rng = np.random.default_rng(3)
    emb = _embeddings(rng)
    interm = rng.standard_normal((1, 64, 64, 160)).astype(np.float32) * 0.5
    points = np.array([[[[320.0, 240.0]]]], np.float32)
    labels = np.array([[[1]]], np.float32)

    want_m, _ = _hq_oracle(model, emb, interm, points=points, labels=labels,
                           multimask_output=False)

    got_m, _ = dec.apply(variables, jnp.asarray(np.moveaxis(emb, 1, -1)),
                         points=jnp.asarray(points),
                         labels=jnp.asarray(labels),
                         intermediate_embeddings=jnp.asarray(interm),
                         multimask_output=False)
    np.testing.assert_allclose(np.asarray(got_m), want_m,
                               rtol=2e-3, atol=2e-3)


def test_hq_jax_mobile_sam_end_to_end():
    """JaxMobileSAM(hq=True): TinyViT interm features flow into the HQ
    decoder through both detector protocols (random init)."""
    from deva_tpu.ext.jax_sam import JaxMobileSAM
    sam = JaxMobileSAM(hq=True, points_per_side=2)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    m = sam.masks_for_boxes(img, np.array([[10.0, 10.0, 80.0, 60.0]]))
    assert m.shape == (1, 96, 128) and m.dtype == bool
    out = sam.generate(img)
    assert out["masks"].shape[1:] == (96, 128)


def _hf_to_original_names(sd):
    """Inverse rename: HF SamHQ state_dict -> the ORIGINAL segment_anything
    / sam-hq layout (the released MobileSAM / Light-HQ-SAM checkpoints).
    Test-only; composing with convert_original_sam_statedict must reproduce
    convert_sam_decoder_statedict(hf_sd) exactly."""
    import re
    out = {}
    for k, v in sd.items():
        if k.startswith("vision_encoder."):
            continue
        nk = k
        nk = nk.replace("shared_image_embedding.positional_embedding",
                        "prompt_encoder.pe_layer."
                        "positional_encoding_gaussian_matrix")
        if nk.startswith("prompt_encoder.shared_embedding"):
            continue  # duplicate of the shared embedding
        nk = nk.replace("prompt_encoder.point_embed.",
                        "prompt_encoder.point_embeddings.")
        for idx, dst in [("conv1", "0"), ("layer_norm1", "1"),
                         ("conv2", "3"), ("layer_norm2", "4"),
                         ("conv3", "6")]:
            nk = nk.replace(f"prompt_encoder.mask_embed.{idx}.",
                            f"prompt_encoder.mask_downscaling.{dst}.")
        nk = re.sub(r"transformer\.layers\.(\d+)\.layer_norm(\d)",
                    r"transformer.layers.\1.norm\2", nk)
        nk = nk.replace("transformer.layer_norm_final_attn",
                        "transformer.norm_final_attn")
        for src, dst in [("upscale_conv1", "output_upscaling.0"),
                         ("upscale_layer_norm", "output_upscaling.1"),
                         ("upscale_conv2", "output_upscaling.3"),
                         ("compress_vit_conv1", "compress_vit_feat.0"),
                         ("compress_vit_norm", "compress_vit_feat.1"),
                         ("compress_vit_conv2", "compress_vit_feat.3"),
                         ("encoder_conv1", "embedding_encoder.0"),
                         ("encoder_norm", "embedding_encoder.1"),
                         ("encoder_conv2", "embedding_encoder.3"),
                         ("mask_conv1", "embedding_maskfeature.0"),
                         ("mask_norm", "embedding_maskfeature.1"),
                         ("mask_conv2", "embedding_maskfeature.3")]:
            nk = nk.replace(f"mask_decoder.{src}.", f"mask_decoder.{dst}.")
        nk = nk.replace("mask_decoder.hq_token", "mask_decoder.hf_token")
        # HF FeedForward proj_in/layers.j/proj_out -> original MLP layers.j
        m = re.match(r"(.*)\.(proj_in|proj_out|layers\.(\d+))\.(weight|bias)$",
                     nk)
        if m and ("hypernetworks" in nk or "iou_prediction" in nk or
                  "hq_mask_mlp" in nk):
            base, which, inner, leaf = m.group(1), m.group(2), m.group(3), \
                m.group(4)
            depth = 3
            j = 0 if which == "proj_in" else \
                depth - 1 if which == "proj_out" else int(inner) + 1
            base = base.replace("hq_mask_mlp", "hf_mlp")
            nk = f"{base}.layers.{j}.{leaf}"
        out[nk] = v
    return out


def test_original_checkpoint_layout_roundtrip(hf_and_flax_hq):
    """convert_original_sam_statedict (the released MobileSAM /
    Light-HQ-SAM .pt layout) must produce EXACTLY the same flax variables
    as the HF-layout converter on the same weights."""
    from deva_tpu.ext.sam_decoder import convert_original_sam_statedict
    model, _, want = hf_and_flax_hq
    orig_sd = _hf_to_original_names(model.state_dict())
    got = convert_original_sam_statedict(orig_sd)

    import jax
    wl = jax.tree_util.tree_leaves_with_path(want)
    gl = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(wl) == len(gl)
    for path_, w in wl:
        g = gl[path_]
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=str(path_))
