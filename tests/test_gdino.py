"""Grounding DINO text-detection path executed with a random-init,
config-built HF model (no weight downloads) — covering the only previously
unexecuted component of the text pipeline
(reference:deva/ext/grounding_dino.py:32-142).

The detect half (text -> boxes/scores/class ids) runs through the real
`HFGroundedSAM.detect` code path; the end-to-end test then drives
segment_with_text (NMS -> per-box best-of-3 masks -> area-sorted rasterize)
with the TPU-native JaxMobileSAM supplying the mask half.
"""
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_tokenizer(tmpdir):
    from transformers import BertTokenizerFast
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             ".", "dog", "cat", "a", "the"]
    path = os.path.join(tmpdir, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(vocab))
    return BertTokenizerFast(vocab_file=path)


@pytest.fixture(scope="module")
def tiny_gdino():
    from transformers import (GroundingDinoConfig,
                              GroundingDinoForObjectDetection,
                              GroundingDinoImageProcessor,
                              GroundingDinoProcessor, SwinConfig)
    torch.manual_seed(0)
    backbone = SwinConfig(image_size=224, embed_dim=16, depths=[1, 1, 1],
                          num_heads=[1, 2, 4], window_size=7,
                          out_features=["stage2", "stage3"])
    cfg = GroundingDinoConfig(
        backbone_config=backbone,
        text_config={"model_type": "bert", "vocab_size": 10,
                     "hidden_size": 32, "num_hidden_layers": 1,
                     "num_attention_heads": 2, "intermediate_size": 37,
                     "max_position_embeddings": 64},
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=37, decoder_ffn_dim=37,
        num_queries=20, num_feature_levels=2,
        max_text_len=32)
    model = GroundingDinoForObjectDetection(cfg).eval()
    tmpdir = tempfile.mkdtemp()
    processor = GroundingDinoProcessor(
        image_processor=GroundingDinoImageProcessor(
            size={"shortest_edge": 64, "longest_edge": 96}),
        tokenizer=_tiny_tokenizer(tmpdir))
    return model, processor


def _detector(tiny_gdino):
    """HFGroundedSAM with the from_pretrained loads bypassed (random init);
    only the GDINO half is populated — detect() is the code under test."""
    from deva_tpu.ext.detectors import HFGroundedSAM
    det = HFGroundedSAM.__new__(HFGroundedSAM)
    det.torch = torch
    det.device = "cpu"
    det.gd_model, det.gd_processor = tiny_gdino
    det.sam_model = det.sam_processor = None
    return det


def test_gdino_detect_executes(tiny_gdino):
    det = _detector(tiny_gdino)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    boxes, scores, class_ids = det.detect(img, ["dog", "cat"],
                                          box_threshold=0.05,
                                          text_threshold=0.05)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert scores.shape == (len(boxes),)
    assert class_ids.shape == (len(boxes),)
    assert ((class_ids == 0) | (class_ids == 1)).all()
    # boxes are in original-image pixel coordinates
    if len(boxes):
        assert (boxes[:, 2] <= 80 + 1e-3).all()
        assert (boxes[:, 3] <= 60 + 1e-3).all()


def test_gdino_segment_with_text_end_to_end(tiny_gdino):
    """text -> GDINO boxes -> NMS -> JaxMobileSAM masks -> area-sorted id
    mask + ObjectInfos (reference:deva/ext/grounding_dino.py:78-142)."""
    from deva_tpu.ext.detectors import segment_with_text
    from deva_tpu.ext.jax_sam import JaxMobileSAM

    gd = _detector(tiny_gdino)
    sam = JaxMobileSAM(seed=1)

    class Hybrid:
        detect = staticmethod(gd.detect)
        masks_for_boxes = staticmethod(sam.masks_for_boxes)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    cfg = {"DINO_THRESHOLD": 0.05, "DINO_NMS_THRESHOLD": 0.8,
           "prompt": "dog.cat"}
    mask, segments_info = segment_with_text(cfg, Hybrid(), img,
                                            ["dog", "cat"], min_side=-1)
    mask = np.asarray(mask)
    assert mask.shape == (64, 96)
    ids = set(np.unique(mask)) - {0}
    assert {s.id for s in segments_info} >= ids
    for s in segments_info:
        assert s.category_ids and s.category_ids[0] in (0, 1)
