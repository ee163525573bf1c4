"""Differential tests for the metrics layer (STQ, VPQ, stuff merging, RLE)
against the reference implementations / known semantics."""
import json
import os

import numpy as np
import pytest

from deva_tpu.metrics.stq import STQuality
from deva_tpu.metrics.eval_vpq_vipseg import PQStat, vpq_video
from deva_tpu.utils import rle as rle_codec
from deva_tpu.utils.pano_utils import id_to_rgb

BIT_SHIFT = 16


def _random_panoptic(rng, n_classes, n_inst, shape=(24, 32)):
    sem = rng.integers(0, n_classes, shape)
    ins = rng.integers(0, n_inst, shape)
    return ((sem << BIT_SHIFT) + ins).astype(np.int32)


def test_stq_matches_reference():
    import deva.vps_metrics.segmentation_and_tracking_quality as ref_stq
    rng = np.random.default_rng(0)
    things = [1, 3, 5]
    ours = STQuality(8, things, 255, BIT_SHIFT, 2 ** 24)
    ref = ref_stq.STQuality(8, things, 255, BIT_SHIFT, 2 ** 24)
    for seq in range(2):
        for _ in range(3):
            gt = _random_panoptic(rng, 8, 4)
            pred = _random_panoptic(rng, 8, 4)
            ours.update_state(gt, pred, seq)
            ref.update_state(gt, pred, seq)
    r_ref = ref.result()
    r_our = ours.result()
    for key in ("STQ", "AQ", "IoU"):
        assert abs(r_our[key] - r_ref[key]) < 1e-10, key
    np.testing.assert_allclose(r_our["STQ_per_seq"], r_ref["STQ_per_seq"])


def _make_vpq_case(tmp_path, rng, t=5, n_cat=4):
    categories = {i: {"id": i, "isthing": int(i % 2 == 1)}
                  for i in range(1, n_cat + 1)}
    gt_pred_set_ref = []
    gt_pred_set_our = []
    for ti in range(t):
        gt = np.zeros((20, 30), np.uint32)
        pred = np.zeros((20, 30), np.uint32)
        gt[2:12, 3:15] = 10
        gt[14:19, 16:29] = 11
        pred[2 + (ti % 2):12, 3:15] = 20
        pred[13:18, 16:28] = 21
        if ti > 2:
            pred[0:2, 0:5] = 22  # unsupported FP
        gt_json = {"segments_info": [
            {"id": 10, "category_id": 1, "iscrowd": 0,
             "area": int((gt == 10).sum())},
            {"id": 11, "category_id": 2, "iscrowd": 0,
             "area": int((gt == 11).sum())},
        ]}
        pred_json = {"segments_info": [
            {"id": 20, "category_id": 1},
            {"id": 21, "category_id": 2},
        ] + ([{"id": 22, "category_id": 3}] if ti > 2 else [])}
        gt_name = str(tmp_path / f"gt_{ti}.png")
        pred_name = str(tmp_path / f"pred_{ti}.png")
        from PIL import Image
        Image.fromarray(id_to_rgb(gt)).save(gt_name)
        Image.fromarray(id_to_rgb(pred)).save(pred_name)
        gt_pred_set_ref.append((gt_json, pred_json, gt_name, pred_name, {}))
        gt_pred_set_our.append((gt_json, pred_json, gt_name, pred_name))
    return categories, gt_pred_set_ref, gt_pred_set_our


@pytest.mark.parametrize("nframes", [1, 2, 4, 999])
def test_vpq_matches_reference(tmp_path, nframes):
    from deva.vps_metrics.eval_vpq_vipseg import vpq_compute_single_core
    rng = np.random.default_rng(1)
    categories, ref_set, our_set = _make_vpq_case(tmp_path, rng)
    ref_stat = vpq_compute_single_core(categories, nframes, ref_set)
    our_stat = vpq_video(categories, nframes, our_set)
    for isthing in (None, True, False):
        r, _ = ref_stat.pq_average(categories, isthing)
        o, _ = our_stat.average(categories, isthing)
        for k in ("pq", "sq", "rq", "n"):
            assert abs(r[k] - o[k]) < 1e-10, (isthing, k, r[k], o[k])


def test_stuff_merging_matches_reference(tmp_path):
    """Compare per-video stuff merging with the reference's worker; avoid id
    collisions so no random re-draws happen on either side."""
    from deva.vps_metrics import stuff_merging as ref_sm
    from deva_tpu.metrics import stuff_merging as our_sm
    from PIL import Image

    # category 1: thing, category 20: stuff (from the VIPSeg table: id 0..123;
    # use real ids: 1=thing? read from table)
    from deva_tpu.utils.vipseg_categories import vipseg_cat_to_isthing
    thing_cats = [c for c, t in vipseg_cat_to_isthing.items() if t]
    thing_cat, thing_cat2 = thing_cats[0], thing_cats[1]
    stuff_cat = next(c for c, t in vipseg_cat_to_isthing.items() if not t)
    other_stuff = next(c for c, t in vipseg_cat_to_isthing.items()
                       if not t and c != stuff_cat)

    vid = "vid0"
    anns = []
    for root in (tmp_path / "ref_in", tmp_path / "our_in"):
        os.makedirs(root / "pan_pred" / vid, exist_ok=True)
    for ti in range(3):
        mask = np.zeros((16, 16), np.int32)
        mask[:4, :4] = 1000
        mask[6:9, 6:9] = 2000
        mask[12:, 12:] = 3000
        segs = [
            # thing whose category changes at ti=2 -> must get a new id
            {"id": 1000, "category_id": thing_cat if ti < 2 else thing_cat2,
             "isthing": 1},
            {"id": 2000, "category_id": stuff_cat, "isthing": 0},
            {"id": 3000, "category_id": other_stuff, "isthing": 0},
        ]
        anns.append({"file_name": f"{ti:05d}.jpg", "segments_info": segs})
        for root in (tmp_path / "ref_in", tmp_path / "our_in"):
            Image.fromarray(id_to_rgb(mask)).save(
                root / "pan_pred" / vid / f"{ti:05d}.png")

    vid_ann = {"video_id": vid, "annotations": anns}
    ref_out = ref_sm.process_single_video(
        vid_ann, str(tmp_path / "ref_in"), str(tmp_path / "ref_out"))
    our_out = our_sm.process_single_video(
        vid_ann, str(tmp_path / "our_in"), str(tmp_path / "our_out"))

    def canonicalize(out):
        """Collision re-draws are random; remap ids by first-appearance order."""
        remap = {}
        canon = {"video_id": out["video_id"], "annotations": []}
        for ann in out["annotations"]:
            segs = []
            for s in ann["segments_info"]:
                if s["id"] not in remap:
                    remap[s["id"]] = len(remap) + 1
                segs.append({**s, "id": remap[s["id"]]})
            canon["annotations"].append(
                {"file_name": ann["file_name"], "segments_info": segs})
        return canon, remap

    ref_canon, ref_map = canonicalize(ref_out)
    our_canon, our_map = canonicalize(our_out)
    assert ref_canon == our_canon

    from deva_tpu.utils.pano_utils import rgb_to_id
    for ti in range(3):
        from PIL import Image as I
        r = rgb_to_id(np.array(I.open(
            tmp_path / "ref_out" / "pan_pred" / vid / f"{ti:05d}.png")))
        o = rgb_to_id(np.array(I.open(
            tmp_path / "our_out" / "pan_pred" / vid / f"{ti:05d}.png")))
        lut_r = np.zeros(max(int(r.max()), max(ref_map)) + 1, np.int64)
        for k, v in ref_map.items():
            lut_r[k] = v
        lut_o = np.zeros(max(int(o.max()), max(our_map)) + 1, np.int64)
        for k, v in our_map.items():
            lut_o[k] = v
        np.testing.assert_array_equal(lut_r[r], lut_o[o])


def test_rle_roundtrip_and_area():
    rng = np.random.default_rng(2)
    for shape in [(1, 1), (7, 5), (64, 48)]:
        m = (rng.uniform(size=shape) > 0.6).astype(np.uint8)
        enc = rle_codec.encode(m)
        assert isinstance(enc["counts"], str)
        np.testing.assert_array_equal(rle_codec.decode(enc), m)
        assert rle_codec.area(enc) == int(m.sum())
    # all-zero and all-one masks
    for m in (np.zeros((5, 4), np.uint8), np.ones((5, 4), np.uint8)):
        np.testing.assert_array_equal(rle_codec.decode(rle_codec.encode(m)), m)
