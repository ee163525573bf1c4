"""Text-prompted pipeline driven by REPLAYED detector outputs on the real
example/vipseg images (VERDICT round-1 item 7): the recorded per-frame
detections (tests/fixtures/replay_dets_vipseg.npz, built by
scripts/make_detector_fixture.py from the reference's shipped detections)
flow through segment_with_text -> semi-online voting -> consensus ILP ->
incorporate_detection -> propagation, producing tracked masks.

With real GDINO/SAM weights the same fixture format is captured by
deva_tpu.ext.detectors.RecordingDetector."""
import json
import os
from os import path

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.ext.detectors import ReplayDetector, segment_with_text
from deva_tpu.ext.with_text_processor import process_frame_with_text
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.demo_utils import flush_buffer
from deva_tpu.inference.result_saver import ResultSaver
from deva_tpu.models.network import DEVANetwork

FIXDIR = path.join(path.dirname(path.abspath(__file__)), "fixtures")
IMG_DIR = "/root/reference/example/vipseg/images"


@pytest.fixture(scope="module")
def clip():
    vid = sorted(os.listdir(IMG_DIR))[0]
    frames = sorted(os.listdir(path.join(IMG_DIR, vid)))
    images = [np.asarray(Image.open(path.join(IMG_DIR, vid, f)).convert(
        "RGB")) for f in frames]
    return frames, images


def test_replay_detector_roundtrip(clip):
    """The replayed outputs must decode to the recorded masks/boxes."""
    frames, images = clip
    det = ReplayDetector(path.join(FIXDIR, "replay_dets_vipseg.npz"))
    boxes, scores, class_ids = det.detect(images[0], ["thing"], 0.35, 0.35)
    assert len(boxes) >= 5 and len(boxes) == len(scores) == len(class_ids)
    masks = det.masks_for_boxes(images[0], boxes)
    assert masks.shape == (len(boxes), *images[0].shape[:2])
    # every box tightly bounds its mask
    for m, b in zip(masks, boxes.astype(int)):
        ys, xs = np.nonzero(m)
        assert (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1) == tuple(b)


def test_text_pipeline_with_replayed_detections(tmp_path, clip):
    frames, images = clip
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                          detection_every=5, num_voting_frames=3,
                          max_missed_detection_count=5, size=240)
    deva = InferenceCore(model, variables, cfg)
    deva.enabled_long_id()
    # random weights produce garbage spatial projections; mock alignment as
    # identity so the consensus votes on the real (replayed) detections
    deva.spatial_alignment = lambda sti, simg, smask, tti, timg: \
        np.concatenate([np.full_like(smask[:1], 0.5), smask], 0)

    saver = ResultSaver(str(tmp_path), None, dataset="demo",
                        object_manager=deva.object_manager)
    det = ReplayDetector(path.join(FIXDIR, "replay_dets_vipseg.npz"))
    ext_cfg = {"prompt": "person.bench.tree", "temporal_setting": "semionline",
               "detection_every": 5, "DINO_THRESHOLD": 0.35,
               "DINO_NMS_THRESHOLD": 0.8}
    for ti, (name, img) in enumerate(zip(frames, images)):
        process_frame_with_text(deva, det, ext_cfg, name, saver, ti,
                                image_np=img)
    flush_buffer(deva, saver, prompts=["person"])
    saver.end()

    pngs = sorted(os.listdir(tmp_path / "Annotations"))
    assert len(pngs) == len(frames)
    anns = saver.video_json["annotations"]
    assert len(anns) == len(frames)
    # the consensus must admit several of the replayed objects and keep
    # their ids across frames (tracking, not re-detection)
    per_frame_ids = [set(s["id"] for s in a["segments_info"])
                     for a in anns]
    assert len(per_frame_ids[0]) >= 4, per_frame_ids[0]
    persistent = per_frame_ids[0] & per_frame_ids[1] & per_frame_ids[2]
    assert len(persistent) >= 3, "objects must persist across frames"
    # masks are non-trivial on the voted frames
    m0 = np.asarray(Image.open(tmp_path / "Annotations" / pngs[0]))
    assert (m0 > 0).mean() > 0.2
