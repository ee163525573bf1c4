"""Merge per-video BURST pred.json files (from manually sharded eval runs)
into one submission json.

Behavioral anchor: reference:scripts/merge_burst_json.py.
Usage: python scripts/merge_burst_json.py gt.json pred_dir out.json
"""
import json
import sys
from os import path


def main():
    gt_json_path, pred_path, out_path = sys.argv[1:4]
    with open(gt_json_path) as f:
        json_file = json.load(f)

    for sequence in json_file["sequences"]:
        video = path.join(sequence["dataset"], sequence["seq_name"])
        sequence["segmentations"] = []
        with open(path.join(pred_path, video, "pred.json")) as f:
            pred_json = json.load(f)
        track_category_id = {}
        for frame_seg in pred_json["segmentations"]:
            this_frame = {}
            for seg in frame_seg["segmentations"]:
                this_frame[seg["id"]] = {"rle": seg["rle"]["counts"]}
                track_category_id[seg["id"]] = 0
            sequence["segmentations"].append(this_frame)
        sequence["track_category_ids"] = track_category_id

    with open(out_path, "w") as f:
        json.dump(json_file, f)


if __name__ == "__main__":
    main()
