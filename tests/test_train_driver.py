"""End-to-end train driver test: stage-0 training on synthetic static data
through deva_tpu.training.train.main, including network export + orbax
checkpoint save and resume."""
import glob
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def static_root(tmp_path):
    root = tmp_path / "static"
    for sub in ("fss", "DUTS-TR", "DUTS-TE", "ecssd", "BIG_small",
                "HRSOD_small"):
        os.makedirs(root / sub)
    rng = np.random.default_rng(0)
    # fss is class-structured (method 0)
    os.makedirs(root / "fss" / "classA")
    for i in range(2):
        img = rng.integers(0, 255, (72, 96, 3), np.uint8)
        gt = np.zeros((72, 96), np.uint8)
        gt[20:50, 30:70] = 255
        Image.fromarray(img).save(root / "fss" / "classA" / f"{i}.jpg")
        Image.fromarray(gt).save(root / "fss" / "classA" / f"{i}.png")
    for sub in ("DUTS-TR", "DUTS-TE", "ecssd", "BIG_small", "HRSOD_small"):
        for i in range(2):
            img = rng.integers(0, 255, (64, 80, 3), np.uint8)
            gt = np.zeros((64, 80), np.uint8)
            gt[10:40, 20:60] = 255
            Image.fromarray(img).save(root / sub / f"{i}.jpg")
            Image.fromarray(gt).save(root / sub / f"{i}.png")
    return str(root)


def test_train_driver_stage0(static_root, tmp_path, monkeypatch):
    from deva_tpu.training.train import main
    monkeypatch.chdir(tmp_path)
    main(["--stages", "0",
          "--static_root", static_root,
          "--exp_id", "smoke",
          "--pix_feat_dim", "64", "--key_dim", "16", "--value_dim", "32",
          "--crop_size", "64",
          "--s0_batch_size", "8", "--s0_iterations", "3",
          "--s0_num_frames", "3", "--s0_num_ref_frames", "2",
          "--num_workers", "0",
          "--log_text_interval", "2", "--log_image_interval", "2",
          "--save_network_interval", "2", "--save_checkpoint_interval", "2",
          "--n_devices", "8"])
    npz = glob.glob(str(tmp_path / "saves" / "*" / "*.npz"))
    assert npz, "weights-only export missing"
    flat = dict(np.load(npz[0]))
    assert any(k.startswith("params/") for k in flat)
    ckpts = glob.glob(str(tmp_path / "saves" / "*" / "*_checkpoint"))
    assert ckpts, "orbax checkpoint missing"

    # resume from the checkpoint for a couple more iterations
    main(["--stages", "0",
          "--static_root", static_root,
          "--exp_id", "NULL",
          "--pix_feat_dim", "64", "--key_dim", "16", "--value_dim", "32",
          "--crop_size", "64",
          "--s0_batch_size", "8", "--s0_iterations", "4",
          "--s0_num_frames", "3", "--s0_num_ref_frames", "2",
          "--num_workers", "0",
          "--load_checkpoint", ckpts[0],
          "--n_devices", "8"])
