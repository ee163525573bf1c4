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


def _mini_vos_video(root, vid, n_frames=5, hw=(64, 80), seed=1):
    """A tiny VOS video tree: JPEGImages/<vid>/*.jpg + Annotations/*.png."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "JPEGImages", vid), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations", vid), exist_ok=True)
    for i in range(n_frames):
        img = rng.integers(0, 255, (*hw, 3), np.uint8)
        gt = np.zeros(hw, np.uint8)
        gt[10:40, 20:50] = 1
        gt[45:60, 55:75] = 2
        Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", vid, f"{i:05d}.jpg"))
        pal = Image.fromarray(gt, mode="P")
        pal.save(os.path.join(root, "Annotations", vid, f"{i:05d}.png"))


def test_train_driver_stage_handoff(static_root, tmp_path, monkeypatch,
                                    capsys):
    """--stages 03: the stage-0 weights must hand off IN MEMORY to a
    stage-3 trainer that steps on VOS data
    (reference:deva/train.py:100-103,246)."""
    from deva_tpu.training.train import main
    from deva_tpu.utils.load_subset import load_sub_davis, load_sub_yv
    monkeypatch.chdir(tmp_path)

    davis_vid = sorted(load_sub_davis())[0]
    yv_vid = sorted(load_sub_yv())[0]
    yv_root = tmp_path / "yv"
    davis_root = tmp_path / "davis"
    ovis_root = tmp_path / "ovis"
    _mini_vos_video(str(yv_root / "train"), yv_vid, seed=2)
    _mini_vos_video(str(davis_root / "2017" / "trainval"), davis_vid, seed=3)
    # DAVIS nests JPEGImages/480p and Annotations/480p
    import shutil
    base = davis_root / "2017" / "trainval"
    for kind in ("JPEGImages", "Annotations"):
        os.makedirs(base / kind / "480p", exist_ok=True)
        shutil.move(str(base / kind / davis_vid),
                    str(base / kind / "480p" / davis_vid))
    _mini_vos_video(str(ovis_root), "vid0", seed=4)

    main(["--stages", "03",
          "--static_root", static_root,
          "--yv_root", str(yv_root),
          "--davis_root", str(davis_root),
          "--ovis_root", str(ovis_root),
          "--exp_id", "handoff",
          "--pix_feat_dim", "64", "--key_dim", "16", "--value_dim", "32",
          "--crop_size", "64",
          "--s0_batch_size", "8", "--s0_iterations", "2",
          "--s0_num_frames", "3", "--s0_num_ref_frames", "2",
          "--s3_batch_size", "8", "--s3_iterations", "2",
          "--s3_num_frames", "3", "--s3_num_ref_frames", "2",
          "--num_workers", "0",
          "--log_text_interval", "1", "--log_image_interval", "100",
          "--save_network_interval", "2", "--save_checkpoint_interval", "100",
          "--n_devices", "8"])
    out = capsys.readouterr().out
    # the stage-0 weights handed off IN MEMORY and stage 3 actually stepped
    # on the VOS mixture
    assert "Loading weights from the previous stage" in out
    assert "Renewed loaders with max_skip=5" in out
    # stage 0 exported weights; stage 3's export only fires near the real
    # 150k-iteration end (save interval densifies to 1000 inside the last
    # 5000 iters — reference:deva/train.py:233-234), so with 2 test
    # iterations only the stage-0 artifact exists
    s0 = glob.glob(str(tmp_path / "saves" / "*handoff-s0" / "*.npz"))
    assert s0, "stage-0 weights-only export missing"
