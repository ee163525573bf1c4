"""Smoke tests for the training data pipeline (host-side augmentation)."""
import os

import numpy as np
import pytest

pass

from PIL import Image


def _make_video_dataset(tmp_path, n_videos=2, n_frames=6, size=64):
    im_root = tmp_path / "JPEGImages"
    gt_root = tmp_path / "Annotations"
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        os.makedirs(im_root / f"vid{v}")
        os.makedirs(gt_root / f"vid{v}")
        for f in range(n_frames):
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(im_root / f"vid{v}" / f"{f:05d}.jpg")
            gt = np.zeros((size, size), np.uint8)
            gt[10:30, 10:30] = 1
            gt[40:60, 40:60] = 2
            Image.fromarray(gt, mode="P").save(
                gt_root / f"vid{v}" / f"{f:05d}.png")
    return str(im_root), str(gt_root)


def test_vos_dataset(tmp_path):
    from deva_tpu.training.data import VOSDataset
    im_root, gt_root = _make_video_dataset(tmp_path)
    np.random.seed(0)
    ds = VOSDataset(im_root, gt_root, max_jump=3, size=96, num_frames=3,
                    max_num_obj=3)
    assert len(ds) == 2
    item = ds[0]
    assert item["rgb"].shape == (3, 96, 96, 3)
    assert item["first_frame_gt"].shape == (3, 96, 96)
    assert item["cls_gt"].shape == (3, 96, 96)
    assert item["selector"].shape == (3,)
    assert item["info"]["num_objects"] >= 1
    assert np.isfinite(item["rgb"]).all()


def test_static_dataset(tmp_path):
    from deva_tpu.training.data import StaticTransformDataset
    rng = np.random.default_rng(1)
    root = tmp_path / "static"
    os.makedirs(root)
    for i in range(3):
        img = rng.integers(0, 255, (80, 100, 3), np.uint8)
        Image.fromarray(img).save(root / f"{i}.jpg")
        gt = np.zeros((80, 100), np.uint8)
        gt[20:60, 30:70] = 255
        Image.fromarray(gt).save(root / f"{i}.png")
    np.random.seed(0)
    ds = StaticTransformDataset([(str(root), 1, 2)], size=96, num_frames=3,
                                max_num_obj=2)
    assert len(ds) == 6
    item = ds[0]
    assert item["rgb"].shape == (3, 96, 96, 3)
    assert item["cls_gt"].max() >= 1


def test_tps_roundtrip():
    from deva_tpu.training.data.tps import random_tps_warp
    # smooth gradient image: a small warp must keep it close
    yy, xx = np.mgrid[0:64, 0:80]
    img_arr = np.stack([yy * 3, xx * 2, (yy + xx)], -1).astype(np.uint8)
    img = Image.fromarray(img_arr)
    mask = Image.fromarray(((yy > 20) & (xx > 30)).astype(np.uint8) * 255)
    np.random.seed(3)
    wim, wgt = random_tps_warp(img, mask, scale=0.02)
    assert wim.size == img.size and wgt.size == mask.size
    a = np.asarray(img, np.float32)
    b = np.asarray(wim, np.float32)
    assert 0 < np.abs(a - b).mean() < 20
    # mask stays binary
    assert set(np.unique(np.asarray(wgt))) <= {0, 255}


def test_train_driver_importable():
    from deva_tpu.training import train  # noqa: F401
    from deva_tpu.training.configuration import Configuration
    c = Configuration()
    c.parse(["--stages", "0", "--s0_iterations", "10"])
    p = c.get_stage_parameters("0")
    assert p["iterations"] == 10 and p["schedule"] == "constant"
