"""Build a ReplayDetector recording from the vendored example/vipseg
detections.

Real GDINO/SAM checkpoints are not downloadable in this environment, so the
text-pipeline fusion math (segment_with_text -> consensus -> tracking) is
exercised against REPLAYED detector outputs instead of synthetic ones. The
example clip's per-frame palette PNG + JSON detections are genuine
image-segmenter outputs shipped by the reference
(reference:example/vipseg/source/), converted here into the
RecordingDetector npz format (per-object masks, bounding boxes, scores,
class ids keyed by image content hash).

With real weights, the same fixture format is produced by wrapping the live
detector in deva_tpu.ext.detectors.RecordingDetector and calling .save().

  python scripts/make_detector_fixture.py   # -> tests/fixtures/replay_dets_vipseg.npz
"""
import json
import os
import sys
from os import path

import numpy as np
from PIL import Image

REPO = path.dirname(path.dirname(path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

from deva_tpu.ext.detectors import _image_key  # noqa: E402


def main():
    src = path.join(REF, "example/vipseg/source")
    vid = sorted(os.listdir(src))[0]
    img_dir = path.join(REF, "example/vipseg/images", vid)
    det_dir = path.join(src, vid)

    flat = {}
    for frame in sorted(os.listdir(img_dir)):
        image_np = np.asarray(Image.open(
            path.join(img_dir, frame)).convert("RGB"))
        id_mask = np.asarray(Image.open(
            path.join(det_dir, frame[:-4] + ".png")).convert("P"), np.int64)
        with open(path.join(det_dir, frame[:-4] + ".json")) as f:
            segs = json.load(f)

        masks, boxes, scores, class_ids = [], [], [], []
        for rank, seg in enumerate(segs):
            m = id_mask == seg["id"]
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            masks.append(m)
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            # the saved detections carry no confidence; use a rank-decayed
            # stand-in (earlier ids first, like detector score ordering)
            scores.append(seg.get("score", 1.0 - 0.01 * rank))
            class_ids.append(seg["category_id"])

        masks = np.stack(masks) if masks else \
            np.zeros((0, *id_mask.shape), bool)
        key = _image_key(image_np)
        flat[f"{key}/boxes"] = np.asarray(boxes, np.float32).reshape(-1, 4)
        flat[f"{key}/scores"] = np.asarray(scores, np.float32)
        flat[f"{key}/class_ids"] = np.asarray(class_ids, np.int64)
        flat[f"{key}/masks_shape"] = np.asarray(masks.shape)
        flat[f"{key}/masks"] = np.packbits(masks, axis=None)
        print(f"{frame}: {len(scores)} objects")

    out = path.join(REPO, "tests", "fixtures", "replay_dets_vipseg.npz")
    os.makedirs(path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **flat)
    print(f"-> {out} ({os.path.getsize(out) // 1024} KiB)")


if __name__ == "__main__":
    main()
