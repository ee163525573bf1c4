"""Driver-level equivalence: eval_vos_batched.py (lockstep groups) must
produce the same output masks as eval_vos.py (sequential, reference-shaped)
on a synthetic generic dataset — including unequal video lengths (replay +
discard past each video's end), per-group object buckets, and long-term
memory consolidation in-driver."""
import os
import runpy
import sys
from os import path

import numpy as np
import pytest
from PIL import Image

HERE = path.dirname(path.abspath(__file__))
REPO = path.dirname(HERE)

H, W = 64, 96


def _write_video(root, name, t, n_obj, rng):
    img_dir = path.join(root, "JPEGImages", name)
    ann_dir = path.join(root, "Annotations", name)
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    base = rng.integers(0, 200, (H // 8, W // 8, 3)).astype(np.float32)
    for ti in range(t):
        img = base + rng.integers(0, 40, (H // 8, W // 8, 3))
        img = np.kron(img, np.ones((8, 8, 1))).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(path.join(img_dir, f"{ti:05d}.png"))
    mask = np.zeros((H, W), np.uint8)
    mask[8:28, 10:40] = 1
    if n_obj > 1:
        mask[36:60, 50:90] = 2
    m = Image.fromarray(mask, mode="P")
    palette = [0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * (256 * 3 - 9)
    m.putpalette(palette)
    m.save(path.join(ann_dir, "00000.png"))


def _run_driver(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(path.join(REPO, "evaluation", script),
                       run_name="__main__")
    finally:
        sys.argv = old


def _load_masks(out_dir):
    masks = {}
    for vid in sorted(os.listdir(out_dir)):
        vd = path.join(out_dir, vid)
        if not path.isdir(vd):
            continue
        for f in sorted(os.listdir(vd)):
            masks[f"{vid}/{f}"] = np.asarray(Image.open(path.join(vd, f)))
    return masks


def test_batched_driver_equals_sequential(tmp_path):
    rng = np.random.default_rng(11)
    data = tmp_path / "data"
    _write_video(str(data), "vid_a", 8, 1, rng)
    _write_video(str(data), "vid_b", 6, 2, rng)  # shorter: exercises replay
    _write_video(str(data), "vid_c", 8, 1, rng)  # groups with vid_a

    # tiny long-term config so consolidation (and usage counting) runs
    # in-driver: hw=24 tokens/frame, max_work=96, writes every frame
    common = ["--dataset", "G", "--generic_path", str(data), "--model", "",
              "--size", "-1", "--mem_every", "1", "--top_k", "8",
              "--max_mid_term_frames", "4", "--min_mid_term_frames", "2",
              "--num_prototypes", "8", "--max_long_term_elements", "2000",
              "--topk_method", "exact"]
    seq_out = str(tmp_path / "seq")
    bat_out = str(tmp_path / "bat")
    _run_driver("eval_vos.py", common + ["--output", seq_out])
    _run_driver("eval_vos_batched.py",
                common + ["--output", bat_out, "--batch", "2"])

    seq = _load_masks(seq_out)
    bat = _load_masks(bat_out)
    assert sorted(seq) == sorted(bat), "output file sets differ"
    for name in sorted(seq):
        a, b = seq[name], bat[name]
        assert a.shape == b.shape
        # random-init outputs are near-uniform, so allow a small near-tie
        # flip budget (same rationale as test_batched_equals_sequential)
        frac = (a != b).mean()
        assert frac <= 0.05, f"{name}: {frac:.2%} pixels differ"
