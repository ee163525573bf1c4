"""End-to-end driver smoke tests on the vendored example clips (CPU,
subprocess — the same commands a user runs)."""
import json
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


def test_eval_vos_example():
    out = _run(["evaluation/eval_vos.py", "--dataset", "G",
                "--generic_path", "./example/vos", "--output",
                "/tmp/_smoke_vos", "--model", "", "--size", "240",
                "--top_k", "8"])
    assert out.returncode == 0, out.stderr[-2000:]
    pngs = sorted(os.listdir("/tmp/_smoke_vos/bmx-trees"))
    assert pngs == ["00000.png", "00001.png", "00002.png", "00003.png"]
    # first frame must reproduce the ground-truth labels (mask passthrough)
    m0 = np.array(Image.open("/tmp/_smoke_vos/bmx-trees/00000.png"))
    gt = np.array(Image.open(
        os.path.join(ROOT, "example/vos/Annotations/bmx-trees/00000.png")))
    assert set(np.unique(m0)) <= set(np.unique(gt)) | {0}
    assert (m0 > 0).any()


def test_eval_vos_chunked_matches_per_frame():
    """--chunk N (block stepping via step_chunk: batched K-frame encode +
    one K*Q-query attention + decode-only scan) must write the same masks
    as the per-frame loop."""
    a = _run(["evaluation/eval_vos.py", "--dataset", "G",
              "--generic_path", "./example/vos", "--output",
              "/tmp/_smoke_vos_pf", "--model", "", "--size", "240",
              "--top_k", "8"])
    assert a.returncode == 0, a.stderr[-2000:]
    b = _run(["evaluation/eval_vos.py", "--dataset", "G",
              "--generic_path", "./example/vos", "--output",
              "/tmp/_smoke_vos_ck", "--model", "", "--size", "240",
              "--top_k", "8", "--chunk", "8"])
    assert b.returncode == 0, b.stderr[-2000:]
    # same file set first — extra/missing/renamed chunked outputs must fail
    assert (sorted(os.listdir("/tmp/_smoke_vos_pf/bmx-trees")) ==
            sorted(os.listdir("/tmp/_smoke_vos_ck/bmx-trees")))
    for f in sorted(os.listdir("/tmp/_smoke_vos_pf/bmx-trees")):
        pa = np.array(Image.open(f"/tmp/_smoke_vos_pf/bmx-trees/{f}"))
        pb = np.array(Image.open(f"/tmp/_smoke_vos_ck/bmx-trees/{f}"))
        # identical up to float-noise boundary pixels (argmax flips)
        assert (pa != pb).mean() < 5e-3, f


def test_eval_with_detections_batched_vipseg_postpipeline():
    """--dataset vipseg in the batched driver writes the aggregate pred.json
    and runs the stuff merge, like the sequential driver
    (reference:evaluation/eval_with_detections.py:254-256,331-336)."""
    out = _run(["evaluation/eval_with_detections_batched.py",
                "--dataset", "vipseg",
                "--img_path", "./example/vipseg/images",
                "--mask_path", "./example/vipseg/source",
                "--output", "/tmp/_smoke_vipseg_bat", "--model", "",
                "--size", "240", "--top_k", "8", "--no_metrics",
                "--num_voting_frames", "2", "--detection_every", "2",
                "--raise_on_error"])
    assert out.returncode == 0, out.stderr[-2000:]
    with open("/tmp/_smoke_vipseg_bat/pred.json") as f:
        pred = json.load(f)
    assert len(pred["annotations"]) == 1
    assert len(pred["annotations"][0]["annotations"]) == 4
    anns = os.listdir("/tmp/_smoke_vipseg_bat/pan_pred/12_1mWNahzcsAc")
    assert len(anns) == 4


def test_eval_with_detections_example():
    out = _run(["evaluation/eval_with_detections.py", "--dataset", "demo",
                "--img_path", "./example/vipseg/images",
                "--mask_path", "./example/vipseg/source",
                "--output", "/tmp/_smoke_vipseg", "--model", "",
                "--size", "240", "--top_k", "8",
                "--num_voting_frames", "2", "--detection_every", "2"])
    assert out.returncode == 0, out.stderr[-2000:]
    anns = sorted(os.listdir("/tmp/_smoke_vipseg/Annotations/12_1mWNahzcsAc"))
    assert len(anns) == 4
    with open("/tmp/_smoke_vipseg/JSONFiles/12_1mWNahzcsAc.json") as f:
        video_json = json.load(f)
    assert len(video_json["annotations"]) == 4
