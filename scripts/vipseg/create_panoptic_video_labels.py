"""Convert VIPSeg panomasks (semantic*100+instance encoding) into COCO-style
RGB panoptic labels + a gt json, as the VPQ/STQ evaluators expect.

Behavioral anchor: reference:scripts/vipseg/create_panoptic_video_labels.py
(which uses panopticapi's IdGenerator; a minimal equivalent is inlined here
since panopticapi isn't a dependency).

Run inside the VIPSeg root after change2_720p.py.
"""
import json
import os
from multiprocessing import Pool
from os import path

import numpy as np
from PIL import Image

ROOT_DIR = "VIPSeg_720P/panomasks"
TARGET_DIR = "VIPSeg_720P/panomasksRGB"
CATEGORY_JSON = "VIPSeg_720P/panoVIPSeg_categories.json"


class IdGenerator:
    """Hands out unique segment ids with distinct RGB colors per category
    (panopticapi semantics: id = r + g*256 + b*256^2)."""

    def __init__(self, categories_dict):
        self.categories = categories_dict
        self.used = set()
        self.rng = np.random.default_rng(0)

    def get_id_and_color(self, cat_id):
        base = np.array(self.categories[cat_id].get(
            "color", self.rng.integers(0, 255, 3)), np.int64)
        while True:
            color = np.clip(base + self.rng.integers(-30, 31, 3), 0, 255)
            sid = int(color[0] + color[1] * 256 + color[2] * 256 * 256)
            if sid not in self.used and sid != 0:
                self.used.add(sid)
                return sid, color.astype(np.uint8)


def conversion_worker(args):
    video, categories_dict = args
    video_dic = {"video_id": video}
    images, annotations = [], []
    id_gen = IdGenerator(categories_dict)
    instid2color = {}

    out_dir = path.join(TARGET_DIR, video)
    os.makedirs(out_dir, exist_ok=True)
    for imgname in sorted(os.listdir(path.join(ROOT_DIR, video))):
        original = np.array(Image.open(path.join(ROOT_DIR, video, imgname)))
        image_id = imgname.split(".")[0]
        images.append({"id": image_id, "width": original.shape[1],
                       "height": original.shape[0], "file_name": imgname})
        pan_format = np.zeros((*original.shape, 3), np.uint8)
        segm_info = []

        for el in np.unique(original):
            if el == 0:
                continue
            # VIPSeg encoding: <125 = stuff semantic id; otherwise
            # semantic*100 + instance
            semantic_id = (int(el) if el < 125 else int(el) // 100) - 1
            if el not in instid2color:
                segment_id, color = id_gen.get_id_and_color(semantic_id)
                instid2color[el] = (segment_id, color)
            segment_id, color = instid2color[el]
            mask = original == el
            pan_format[mask] = color
            segm_info.append({"id": segment_id,
                              "category_id": semantic_id,
                              "area": int(mask.sum()),
                              "iscrowd": 0})

        Image.fromarray(pan_format).save(path.join(out_dir, imgname))
        annotations.append({"image_id": image_id,
                            "file_name": imgname,
                            "segments_info": segm_info})

    video_dic["images"] = images
    video_dic["annotations"] = annotations
    return video_dic


def main():
    with open(CATEGORY_JSON) as f:
        categories = json.load(f)
    categories_dict = {c["id"]: c for c in categories}

    videos = sorted(v for v in os.listdir(ROOT_DIR) if not v.startswith("."))
    with Pool(16) as p:
        results = p.map(conversion_worker,
                        [(v, categories_dict) for v in videos])

    out = {
        "videos": [{"video_id": r["video_id"], "images": r["images"]}
                   for r in results],
        "annotations": [{"video_id": r["video_id"],
                         "annotations": r["annotations"]} for r in results],
        "categories": categories,
    }
    with open("VIPSeg_720P/panoptic_gt_VIPSeg_val.json", "w") as f:
        json.dump(out, f)
    print("finish")


if __name__ == "__main__":
    main()
