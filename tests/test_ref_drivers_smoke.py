"""End-to-end smoke for the referring / saliency bidirectional drivers on a
tiny synthetic soft-mask dataset (CPU, subprocess — the commands a user
runs). Covers consensus-with-scores keyframe selection + backward/forward
propagation + prefetch wiring (reference:evaluation/eval_ref_davis.py:45-157)."""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")


def _run(args):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=ROOT, env=ENV, timeout=900)


@pytest.fixture()
def ref_davis_root(tmp_path):
    rng = np.random.default_rng(7)
    h, w, t = 64, 96, 6
    img_dir = tmp_path / "JPEGImages" / "vid0"
    mask_dir = tmp_path / "masks" / "vid0" / "1"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    base = rng.integers(0, 255, (h // 8, w // 8, 3)).astype(np.uint8)
    lines = []
    for i in range(t):
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:05d}.jpg")
        prob = np.zeros((h, w), np.uint8)
        prob[10 + i:40 + i, 20:60] = 255
        Image.fromarray(prob).save(mask_dir / f"{i:05d}.png")
        lines.append(f"{i:05d}.png,1,{0.5 + 0.05 * i:.2f}")
    with open(tmp_path / "masks" / "vid0" / "scores.csv", "w") as f:
        f.write("\n".join(lines))
    return tmp_path


def test_eval_ref_davis_smoke(ref_davis_root, tmp_path):
    out_dir = tmp_path / "out"
    out = _run(["evaluation/eval_ref_davis.py",
                "--img_path", str(ref_davis_root / "JPEGImages"),
                "--mask_path", str(ref_davis_root / "masks"),
                "--output", str(out_dir), "--model", "",
                "--num_voting_frames", "3", "--top_k", "8", "--size", "-1"])
    assert out.returncode == 0, out.stderr[-2000:]
    saved = sorted(os.listdir(out_dir / "vid0"))
    assert "key.txt" in saved
    pngs = [f for f in saved if f.endswith(".png")]
    assert len(pngs) == 6, saved  # every frame saved (backward + forward)


def test_eval_saliency_smoke(tmp_path):
    """eval_saliency end-to-end on a tiny synthetic DAVIS16-style soft-mask
    video (single object, score-free keyframe selection)."""
    rng = np.random.default_rng(9)
    h, w, t = 64, 96, 6
    img_dir = tmp_path / "JPEGImages" / "vid0"
    mask_dir = tmp_path / "masks" / "vid0"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    base = rng.integers(0, 255, (h // 8, w // 8, 3)).astype(np.uint8)
    for i in range(t):
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:05d}.jpg")
        prob = np.zeros((h, w), np.uint8)
        prob[8 + 2 * i:40 + 2 * i, 24:64] = 255
        Image.fromarray(prob).save(mask_dir / f"{i:05d}.png")

    out_dir = tmp_path / "out"
    out = _run(["evaluation/eval_saliency.py",
                "--img_path", str(tmp_path / "JPEGImages"),
                "--mask_path", str(tmp_path / "masks"),
                "--output", str(out_dir), "--model", "",
                "--num_voting_frames", "3", "--top_k", "8", "--size", "-1"])
    assert out.returncode == 0, out.stderr[-2000:]
    saved = sorted(os.listdir(out_dir / "vid0"))
    assert "key.txt" in saved
    assert len([f for f in saved if f.endswith(".png")]) == t, saved


def test_eval_ref_youtubevos_smoke(tmp_path):
    """eval_ref_youtubevos end-to-end: per-object soft masks + scores.csv +
    the meta-expressions json; the video name must be in the official val
    subset (deva_tpu/utils/subsets/referring-youtubevos-val.txt)."""
    import json as _json
    vid = "0062f687f1"  # first entry of the subset list
    rng = np.random.default_rng(11)
    h, w, t = 64, 96, 6
    img_dir = tmp_path / "JPEGImages" / vid
    obj_dir = tmp_path / "masks" / vid / "obj1"
    os.makedirs(img_dir)
    os.makedirs(obj_dir)
    base = rng.integers(0, 255, (h // 8, w // 8, 3)).astype(np.uint8)
    lines = []
    frames = []
    for i in range(t):
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:05d}.jpg")
        prob = np.zeros((h, w), np.uint8)
        prob[10 + i:44 + i, 16:56] = 255
        Image.fromarray(prob).save(obj_dir / f"{i:05d}.png")
        lines.append(f"{i:05d}.png,obj1,{0.4 + 0.05 * i:.2f}")
        frames.append(f"{i:05d}")
    with open(tmp_path / "masks" / vid / "scores.csv", "w") as f:
        f.write("\n".join(lines))
    meta = {"videos": {vid: {"frames": frames}}}
    with open(tmp_path / "meta.json", "w") as f:
        _json.dump(meta, f)

    out_dir = tmp_path / "out"
    out = _run(["evaluation/eval_ref_youtubevos.py",
                "--img_path", str(tmp_path / "JPEGImages"),
                "--mask_path", str(tmp_path / "masks"),
                "--json_path", str(tmp_path / "meta.json"),
                "--output", str(out_dir), "--model", "",
                "--num_voting_frames", "3", "--top_k", "8", "--size", "-1"])
    assert out.returncode == 0, out.stderr[-2000:]
    saved = sorted(os.listdir(out_dir / "Annotations" / vid / "obj1"))
    assert "key.txt" in saved
    assert len([f for f in saved if f.endswith(".png")]) == t, saved
