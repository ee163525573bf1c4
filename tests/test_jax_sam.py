"""JaxMobileSAM (flax TinyViT + flax SAM decoder) behind the pluggable
detector protocols, with random-init weights — exercises preprocessing,
box/point prompting, mask postprocessing, and the auto_segment fusion
plumbing end to end. Numerical parity of the two networks is covered by
tests/test_tiny_vit.py and tests/test_sam_decoder.py."""
import numpy as np
import pytest

from deva_tpu.ext.detectors import auto_segment
from deva_tpu.ext.jax_sam import JaxMobileSAM

H, W = 240, 320


@pytest.fixture(scope="module")
def sam():
    return JaxMobileSAM(points_per_side=2, pred_iou_thresh=-1e9,
                        nms_iou=0.99)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    img[40:120, 60:180] = [200, 40, 40]
    return img


def test_masks_for_boxes_protocol(sam, image):
    boxes = np.array([[60, 40, 180, 120], [10, 10, 100, 100]], np.float32)
    masks = sam.masks_for_boxes(image, boxes)
    assert masks.shape == (2, H, W) and masks.dtype == bool
    assert sam.masks_for_boxes(image, np.zeros((0, 4))).shape == (0, H, W)


def test_generate_protocol_and_auto_segment(sam, image):
    out = sam.generate(image)
    assert out["masks"].shape[1:] == (H, W)
    assert out["masks"].shape[0] == out["iou_preds"].shape[0]
    assert out["masks"].shape[0] >= 1  # iou filter disabled in fixture

    cfg = {"SAM_NUM_POINTS_PER_SIDE": 2, "SAM_OVERLAP_THRESHOLD": 0.5}
    mask, segments_info = auto_segment(cfg, sam, image, None, min_side=120,
                                       suppress_small_mask=False)
    assert mask.shape == (120, 160)
    assert len(segments_info) == len(np.unique(mask)) - (0 in np.unique(mask))


def test_variant_factories_build_tpu_native():
    """--sam_variant mobile/sam_hq_light routes to the TPU-native
    JaxMobileSAM through the reference's 4-way dispatch
    (reference:deva/ext/grounding_dino.py:41-73)."""
    from types import SimpleNamespace

    from deva_tpu.ext.detectors import build_auto_generator
    from deva_tpu.ext.jax_sam import JaxMobileSAM

    args = SimpleNamespace(sam_variant="mobile",
                           MOBILE_SAM_CHECKPOINT_PATH="/nonexistent.pt",
                           LIGHT_HQ_SAM_CHECKPOINT_PATH="/nonexistent.pt",
                           SAM_NUM_POINTS_PER_SIDE=2,
                           SAM_NUM_POINTS_PER_BATCH=4,
                           SAM_PRED_IOU_THRESHOLD=0.5)
    gen = build_auto_generator(args)
    assert isinstance(gen, JaxMobileSAM) and not gen.hq

    args.sam_variant = "sam_hq_light"
    gen = build_auto_generator(args)
    assert isinstance(gen, JaxMobileSAM) and gen.hq
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    out = gen.generate(img)
    assert out["masks"].shape[1:] == (64, 96)
