"""In-repo DAVIS J&F evaluator (deva_tpu/metrics/jf.py).

Property tests pin the metric against hand-computed values and an
independent brute-force boundary matcher (explicit euclidean distances
instead of disk dilation), plus a driver e2e on palette PNG directories.
"""
import os
import subprocess
import sys
from math import ceil, sqrt

import numpy as np
import pytest

from deva_tpu.metrics.jf import (SequenceResult, _boundary_map, _statistics,
                                 aggregate, evaluate_masks,
                                 evaluate_sequence_dirs, f_boundary, jaccard)


def test_jaccard_basics():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True
    assert jaccard(a, a) == 1.0
    assert jaccard(a, b) == 0.0  # pred nonempty, gt empty
    assert jaccard(b, b) == 1.0  # both empty
    b[4:8, 2:6] = True  # half overlap: inter 8, union 24
    assert abs(jaccard(a, b) - 8 / 24) < 1e-12


def test_jaccard_void_excluded():
    pred = np.zeros((8, 8), bool)
    gt = np.zeros((8, 8), bool)
    pred[0:4] = True
    gt[0:4] = True
    void = np.zeros((8, 8), bool)
    void[0:2] = True
    pred_extra = pred.copy()
    pred_extra[0:2, :] = True  # differences only inside void
    assert jaccard(pred_extra, gt, void=void) == jaccard(pred, gt, void=void)


def test_boundary_map_square():
    seg = np.zeros((8, 8), bool)
    seg[2:6, 2:6] = True
    b = _boundary_map(seg)
    inner = np.zeros_like(seg)
    inner[3:5, 3:5] = True
    assert not (b & inner).any()  # interior is not boundary
    # the east/south/southeast stencil assigns a transition to the EARLIER
    # pixel: top/left edges land on the background side, bottom/right on
    # the foreground side (seg2bmap convention — consistent between the
    # two masks being matched, which is all the F-measure needs)
    assert b[1, 1] and b[1, 3] and b[3, 1]  # outside ring, top/left
    assert b[5, 5] and b[5, 3] and b[3, 5]  # foreground ring, bottom/right
    assert not b[0, 0] and not b[7, 7]


def test_f_boundary_identical_and_disjoint():
    a = np.zeros((32, 32), bool)
    a[4:12, 4:12] = True
    assert f_boundary(a, a) == 1.0
    b = np.zeros((32, 32), bool)
    b[20:30, 20:30] = True
    assert f_boundary(a, b) == 0.0
    empty = np.zeros((32, 32), bool)
    assert f_boundary(empty, empty) == 1.0
    assert f_boundary(a, empty) == 0.0


def test_f_boundary_small_shift_within_tolerance():
    # tolerance = ceil(0.008 * diag(64,64)) = 1 pixel; a 1-pixel shift keeps
    # every boundary pixel within matching distance -> F = 1
    a = np.zeros((64, 64), bool)
    a[10:30, 10:30] = True
    b = np.roll(a, 1, axis=0)
    assert f_boundary(a, b) == 1.0
    # a 5-pixel shift leaves the parallel edges matched but pushes the two
    # leading/trailing edges out of tolerance -> strictly between 0 and 1
    c = np.roll(a, 5, axis=0)
    f = f_boundary(a, c)
    assert 0.0 < f < 1.0


def _brute_force_f(pred, gt, bound_th=0.008):
    """Independent matcher: explicit pairwise euclidean distances."""
    h, w = gt.shape
    tol = ceil(bound_th * sqrt(h * h + w * w))
    pb = np.argwhere(_boundary_map(pred))
    gb = np.argwhere(_boundary_map(gt))
    if len(pb) == 0 and len(gb) == 0:
        return 1.0
    if len(pb) == 0 or len(gb) == 0:
        return 0.0
    d = np.sqrt(((pb[:, None, :] - gb[None, :, :]) ** 2).sum(-1))
    precision = (d.min(1) <= tol).mean()
    recall = (d.min(0) <= tol).mean()
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def test_f_boundary_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(4):
        # random blobby masks from thresholded low-frequency noise
        base = rng.standard_normal((6, 6))
        up = np.kron(base, np.ones((8, 8)))  # 48x48
        pred = up > 0.2
        gt = np.kron(rng.standard_normal((6, 6)), np.ones((8, 8))) > 0.2
        assert abs(f_boundary(pred, gt) - _brute_force_f(pred, gt)) < 1e-12


def test_statistics_recall_decay():
    mean, rec, decay = _statistics(np.array([1.0, 1.0, 0.0, 0.0]))
    assert mean == 0.5 and rec == 0.5
    assert decay == 1.0  # first bin mean 1, last bin mean 0
    _, _, d0 = _statistics(np.array([0.7, 0.7]))
    assert d0 == 0.0  # too short for 4 bins


def test_evaluate_masks_multi_object_and_skip():
    h = w = 40
    gt = np.zeros((h, w), np.uint8)
    gt[5:15, 5:15] = 1
    gt[20:30, 20:30] = 2
    frames_gt = [gt] * 5
    pred_perfect = [gt.copy()] * 5
    # frame 0 and 4 are excluded: corrupt them and expect a perfect score
    pred = [np.zeros_like(gt)] + pred_perfect[1:4] + [np.zeros_like(gt)]
    res = evaluate_masks(pred, frames_gt, name="toy")
    assert res.object_ids == [1, 2]
    for oid in (1, 2):
        assert res.j_per_object[oid].shape == (3,)
        np.testing.assert_allclose(res.j_per_object[oid], 1.0)
        np.testing.assert_allclose(res.f_per_object[oid], 1.0)
    assert res.summary()["JF"] == 1.0


def test_aggregate_table():
    r = SequenceResult(name="s", object_ids=[1])
    r.j_per_object[1] = np.array([1.0, 0.0, 1.0, 0.0])
    r.f_per_object[1] = np.array([1.0, 1.0, 1.0, 1.0])
    t = aggregate([r])
    assert t["J_mean"] == 0.5 and t["F_mean"] == 1.0 and t["J&F"] == 0.75
    assert t["F_recall"] == 1.0 and t["J_recall"] == 0.5


def _write_palette_png(path, arr):
    from PIL import Image
    img = Image.fromarray(arr.astype(np.uint8), mode="P")
    img.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759)
    img.save(path)


def _make_seq_dirs(tmp_path, noisy=False):
    rng = np.random.default_rng(3)
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    for seq in ("alpha", "beta"):
        (gt_root / seq).mkdir(parents=True)
        (pred_root / seq).mkdir(parents=True)
        for t in range(4):
            gt = np.zeros((24, 32), np.uint8)
            gt[4 + t:12 + t, 6:16] = 1
            if seq == "beta":
                gt[14:20, 20:30] = 2
            _write_palette_png(str(gt_root / seq / f"{t:05d}.png"), gt)
            pred = gt.copy()
            if noisy and t == 1:
                pred = np.roll(pred, 2, axis=1)
            _write_palette_png(str(pred_root / seq / f"{t:05d}.png"), pred)
    return str(pred_root), str(gt_root)


def test_sequence_dirs_perfect(tmp_path):
    pred_root, gt_root = _make_seq_dirs(tmp_path)
    results = [evaluate_sequence_dirs(os.path.join(pred_root, s),
                                      os.path.join(gt_root, s))
               for s in ("alpha", "beta")]
    table = aggregate(results)
    assert table["J&F"] == 1.0 and table["J_recall"] == 1.0


def test_eval_jf_driver(tmp_path):
    pred_root, gt_root = _make_seq_dirs(tmp_path, noisy=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "evaluation", "eval_jf.py"),
         "--results_path", pred_root, "--gt_path", gt_root],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "J&F=" in out.stdout
    # the noisy frame is mid-sequence (not skipped) -> strictly below 1
    val = float(out.stdout.split("J&F=")[1].split()[0])
    assert 0.5 < val < 1.0
    assert os.path.exists(os.path.join(pred_root, "global_results.csv"))
    assert os.path.exists(os.path.join(pred_root,
                                       "per_sequence_results.csv"))
