"""End-to-end tests of the external-detector layer with synthetic detectors
(the detector protocol is pluggable; no GDINO/SAM weights needed)."""
import json
import os

import numpy as np
import pytest

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.ext.automatic_processor import process_frame_automatic
from deva_tpu.ext.detectors import auto_segment, box_nms, segment_with_text
from deva_tpu.ext.with_text_processor import process_frame_with_text
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.demo_utils import flush_buffer
from deva_tpu.inference.result_saver import ResultSaver
from deva_tpu.models.network import DEVANetwork

import jax

H, W = 64, 96


class SyntheticTextDetector:
    """Two moving boxes; masks are the boxes themselves."""

    def detect(self, image_np, prompts, box_threshold, text_threshold):
        boxes = np.array([[10, 8, 40, 28], [50, 36, 90, 60]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        class_ids = np.array([0, 1], np.int64)
        return boxes, scores, class_ids

    def masks_for_boxes(self, image_np, boxes):
        h, w = image_np.shape[:2]
        masks = np.zeros((len(boxes), h, w), bool)
        for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
            masks[i, y1:y2, x1:x2] = True
        return masks


class SyntheticGenerator:
    def generate(self, image_np, positive_points=None):
        h, w = image_np.shape[:2]
        m1 = np.zeros((h, w), np.float32)
        m1[8:28, 10:40] = 1.0
        m2 = np.zeros((h, w), np.float32)
        m2[36:60, 50:90] = 1.0
        return {"masks": np.stack([m1, m2]),
                "iou_preds": np.array([0.95, 0.9], np.float32)}


@pytest.fixture(scope="module")
def model_and_vars():
    import jax.numpy as jnp
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    return model, variables


def _frames(rng, t):
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    out = []
    for i in range(t):
        img = base + 0.1 * rng.standard_normal((H // 8, W // 8, 3))
        arr = np.kron(img, np.ones((8, 8, 1)))
        arr = ((arr - arr.min()) / (np.ptp(arr) + 1e-6) * 255).astype(np.uint8)
        out.append(arr)
    return out


def _cfg():
    return InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                           detection_every=3, num_voting_frames=2,
                           max_missed_detection_count=3, size=-1)


def test_segment_with_text_fusion():
    det = SyntheticTextDetector()
    cfg = {"DINO_THRESHOLD": 0.35, "DINO_NMS_THRESHOLD": 0.8}
    img = np.zeros((H, W, 3), np.uint8)
    mask, infos = segment_with_text(cfg, det, img, ["cat", "dog"], -1)
    assert sorted(np.unique(mask).tolist()) == [0, 1, 2]
    assert len(infos) == 2
    # smaller box painted last (on top): id of the smaller area box wins ties
    areas = {i.id: int((mask == i.id).sum()) for i in infos}
    assert all(a > 0 for a in areas.values())


def test_auto_segment_prefer_small_and_suppress():
    gen = SyntheticGenerator()
    cfg = {"SAM_NUM_POINTS_PER_SIDE": 8, "SAM_OVERLAP_THRESHOLD": 0.8}
    img = np.zeros((H, W, 3), np.uint8)
    for suppress in (False, True):
        mask, infos = auto_segment(cfg, gen, img, None, -1, suppress)
        assert len(infos) == 2
        assert (mask > 0).sum() > 0
    # forward mask covering everything -> no positive points -> empty output
    fwd = np.ones((H, W), np.int64)
    mask, infos = auto_segment(cfg, gen, img, fwd, -1, False)
    assert len(infos) == 0 and (mask == 0).all()


def test_box_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = box_nms(boxes, scores, 0.5)
    assert keep == [0, 2]


@pytest.mark.parametrize("temporal_setting", ["semionline", "online"])
def test_process_frame_with_text_end_to_end(tmp_path, model_and_vars,
                                            temporal_setting):
    model, variables = model_and_vars
    deva = InferenceCore(model, variables, _cfg())
    deva.enabled_long_id()
    if temporal_setting == "semionline":
        # random weights produce garbage projections, so the consensus would
        # (correctly) select nothing; mock alignment as identity so the
        # voting/incorporation state machine is exercised deterministically
        deva.spatial_alignment = lambda sti, simg, smask, tti, timg: \
            np.concatenate([np.full_like(smask[:1], 0.5), smask], 0)
    saver = ResultSaver(str(tmp_path), None, dataset="demo",
                        object_manager=deva.object_manager)
    ext_cfg = {"prompt": "cat.dog", "temporal_setting": temporal_setting,
               "detection_every": 3, "DINO_THRESHOLD": 0.35,
               "DINO_NMS_THRESHOLD": 0.8}
    det = SyntheticTextDetector()
    rng = np.random.default_rng(0)
    for ti, frame in enumerate(_frames(rng, 6)):
        process_frame_with_text(deva, det, ext_cfg, f"{ti:05d}.jpg", saver,
                                ti, image_np=frame)
    flush_buffer(deva, saver, prompts=["cat", "dog"])
    saver.end()
    pngs = os.listdir(tmp_path / "Annotations")
    assert len(pngs) == 6
    assert len(saver.video_json["annotations"]) == 6
    assert deva.object_manager.num_obj >= 2


def test_process_frame_automatic_end_to_end(tmp_path, model_and_vars):
    model, variables = model_and_vars
    deva = InferenceCore(model, variables, _cfg())
    deva.enabled_long_id()
    deva.spatial_alignment = lambda sti, simg, smask, tti, timg: \
        np.concatenate([np.full_like(smask[:1], 0.5), smask], 0)
    saver = ResultSaver(str(tmp_path), None, dataset="demo",
                        object_manager=deva.object_manager)
    ext_cfg = {"temporal_setting": "semionline", "detection_every": 3,
               "suppress_small_objects": False,
               "SAM_NUM_POINTS_PER_SIDE": 8, "SAM_OVERLAP_THRESHOLD": 0.8}
    gen = SyntheticGenerator()
    rng = np.random.default_rng(1)
    for ti, frame in enumerate(_frames(rng, 6)):
        process_frame_automatic(deva, gen, ext_cfg, f"{ti:05d}.jpg", saver,
                                ti, image_np=frame)
    flush_buffer(deva, saver)
    saver.end()
    assert len(os.listdir(tmp_path / "Annotations")) == 6
    assert deva.object_manager.num_obj >= 1
