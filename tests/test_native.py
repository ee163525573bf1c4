"""Native C++ host kernels (RLE, joint histogram, MWIS) vs Python fallbacks."""
import numpy as np
import pytest

from deva_tpu.utils import native
from deva_tpu.utils import rle as rle_codec
from deva_tpu.inference.ilp import solve_consensus_ilp

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None,
                                reason="native lib unavailable (no g++)")


def test_native_rle_roundtrip_and_python_compat():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (33, 17), (480, 854)]:
        m = (rng.uniform(size=shape) > 0.7).astype(np.uint8)
        s_native = native.rle_encode(m)
        s_python = rle_codec._leb_encode(rle_codec._runs_from_mask(m))
        assert s_native == s_python
        out = native.rle_decode(s_native, *shape)
        np.testing.assert_array_equal(out, m)
    for m in (np.zeros((5, 4), np.uint8), np.ones((5, 4), np.uint8)):
        s = native.rle_encode(m)
        np.testing.assert_array_equal(native.rle_decode(s, 5, 4), m)


def test_native_joint_hist():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 7, 5000)
    b = rng.integers(0, 11, 5000)
    out = native.joint_hist(a, b, 11)
    ref = np.zeros((a.max() + 1, 11), np.int64)
    np.add.at(ref, (a, b), 1)
    np.testing.assert_array_equal(out, ref)


def test_native_mwis_matches_python():
    rng = np.random.default_rng(2)
    for _ in range(25):
        n = int(rng.integers(1, 12))
        iou = np.zeros((n, n), np.float32)
        for i in range(n):
            for j in range(i + 1, n):
                if rng.uniform() < 0.4:
                    iou[i, j] = rng.uniform(0.5, 1.0)
        iou = iou + iou.T
        conflict = iou > 0.49
        sel_native = solve_consensus_ilp(iou, conflict)  # native path
        w = 2.0 * iou.sum(axis=0) - 1.0
        val_native = float((w * np.asarray(sel_native)).sum())
        # brute force
        best = -np.inf
        for m in range(2 ** n):
            sel = [(m >> i) & 1 == 1 for i in range(n)]
            idx = [i for i, s in enumerate(sel) if s]
            if any(conflict[i, j] for i in idx for j in idx if i != j):
                continue
            best = max(best, float((w * np.asarray(sel)).sum()))
        assert abs(val_native - best) < 1e-9
