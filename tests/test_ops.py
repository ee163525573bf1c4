"""Differential tests: deva_tpu ops vs the reference implementation (torch CPU).

The reference repo is mounted read-only at /root/reference; we import its pure
math functions as oracles. Tests skip if the reference is unavailable.
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from deva_tpu.ops import (pad_divide_by, unpad, downsample_area,
                          upsample_bilinear, aggregate_logits)
from deva_tpu.ops import memory_attention as ma

REF = "/root/reference"
torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

ref_tensor_utils = pytest.importorskip("deva.utils.tensor_utils")
ref_memory_utils = pytest.importorskip("deva.model.memory_utils")

RNG = np.random.default_rng(0)


def test_pad_divide_by_matches_reference():
    for h, w in [(480, 854), (477, 853), (16, 16), (1, 1)]:
        x = RNG.standard_normal((3, h, w)).astype(np.float32)
        ref_out, ref_pad = ref_tensor_utils.pad_divide_by(torch.from_numpy(x), 16)
        # ours is channel-last
        ours, pad = pad_divide_by(jnp.asarray(x.transpose(1, 2, 0)), 16, 0, 1)
        assert pad == tuple(ref_pad)
        np.testing.assert_array_equal(np.asarray(ours).transpose(2, 0, 1),
                                      ref_out.numpy())
        back = unpad(ours, pad, 0, 1)
        np.testing.assert_array_equal(np.asarray(back).transpose(2, 0, 1), x)


@pytest.mark.parametrize("factor", [2, 4, 16])
def test_downsample_area_matches_torch(factor):
    x = RNG.standard_normal((2, 32, 64, 5)).astype(np.float32)
    ours = np.asarray(downsample_area(jnp.asarray(x), factor))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(tx, scale_factor=1 / factor, mode="area")
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("factor", [2, 4, 16])
def test_upsample_bilinear_matches_torch(factor):
    x = RNG.standard_normal((2, 9, 13, 3)).astype(np.float32)
    ours = np.asarray(upsample_bilinear(jnp.asarray(x), factor))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(tx, scale_factor=factor,
                                          mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


def test_aggregate_matches_reference():
    from deva.model.network import DEVA
    prob = RNG.uniform(0, 1, size=(4, 17, 23)).astype(np.float32)
    ref = DEVA.aggregate(None, torch.from_numpy(prob), dim=0)
    ours = np.asarray(aggregate_logits(jnp.asarray(prob), axis=0))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=2e-4)


def _random_attention_inputs(n=300, q=77, ck=64, cv=32, o=3):
    mk = RNG.standard_normal((n, ck)).astype(np.float32)
    ms = RNG.uniform(1.0, 5.0, size=(n,)).astype(np.float32)
    qk = RNG.standard_normal((q, ck)).astype(np.float32)
    qe = RNG.uniform(0, 1, size=(q, ck)).astype(np.float32)
    v = RNG.standard_normal((o, n, cv)).astype(np.float32)
    return mk, ms, qk, qe, v


def _ref_similarity(mk, ms, qk, qe):
    # reference layout: [B, C, N]
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a.T))[None]
    sim = ref_memory_utils.get_similarity(
        t(mk), torch.from_numpy(ms)[None, None, :] if ms is not None else None,
        t(qk), t(qe) if qe is not None else None)
    return sim[0].numpy()  # [N, Q]


@pytest.mark.parametrize("with_sel", [True, False])
@pytest.mark.parametrize("with_shrink", [True, False])
def test_similarity_matches_reference(with_sel, with_shrink):
    mk, ms, qk, qe, _ = _random_attention_inputs()
    ours = np.asarray(ma.get_similarity(jnp.asarray(mk),
                                        jnp.asarray(ms) if with_shrink else None,
                                        jnp.asarray(qk),
                                        jnp.asarray(qe) if with_sel else None))
    ref = _ref_similarity(mk, ms if with_shrink else None, qk,
                          qe if with_sel else None)
    np.testing.assert_allclose(ours, ref.T, rtol=1e-4, atol=1e-4)


def test_topk_softmax_and_readout_match_reference():
    mk, ms, qk, qe, v = _random_attention_inputs()
    sim = ma.get_similarity(jnp.asarray(mk), jnp.asarray(ms),
                            jnp.asarray(qk), jnp.asarray(qe))
    aff, usage = ma.topk_softmax(sim, top_k=30, return_usage=True)

    ref_sim = torch.from_numpy(_ref_similarity(mk, ms, qk, qe))[None]  # [1,N,Q]
    ref_aff, ref_usage = ref_memory_utils.do_softmax(ref_sim, top_k=30,
                                                     return_usage=True)
    np.testing.assert_allclose(np.asarray(aff), ref_aff[0].numpy().T,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(usage), ref_usage[0].numpy(),
                               rtol=1e-4, atol=1e-5)

    out = ma.readout(aff, jnp.asarray(v))  # [O, Q, Cv]
    # reference _readout: v [O, C, N] @ aff [N, Q] (memory_manager.py:64-75)
    ref_out = np.einsum("onc,nq->ocq", v, ref_aff[0].numpy())
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref_out,
                               rtol=1e-3, atol=1e-4)


def test_masked_fixed_shape_equals_dynamic_prefix():
    """A fixed-capacity ring with validity mask must reproduce the dynamic-shape
    result on the valid prefix exactly (the core ring-buffer invariant)."""
    mk, ms, qk, qe, v = _random_attention_inputs(n=200)
    n_cap = 512
    pad = lambda a, axis: np.concatenate(
        [a, RNG.standard_normal((*a.shape[:axis], n_cap - a.shape[axis],
                                 *a.shape[axis + 1:])).astype(np.float32)], axis)
    mk_p, ms_p, v_p = pad(mk, 0), pad(ms, 0), pad(v, 1)
    valid = np.arange(n_cap) < 200

    ref_out = ma.attend(jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(v),
                        jnp.asarray(qk), jnp.asarray(qe), top_k=30)
    out, usage = ma.attend(jnp.asarray(mk_p), jnp.asarray(ms_p), jnp.asarray(v_p),
                           jnp.asarray(qk), jnp.asarray(qe), top_k=30,
                           valid=jnp.asarray(valid), return_usage=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(usage)[200:] == 0)


def test_full_softmax_matches_reference():
    mk, ms, qk, qe, _ = _random_attention_inputs()
    sim = ma.get_similarity(jnp.asarray(mk), jnp.asarray(ms),
                            jnp.asarray(qk), jnp.asarray(qe))
    ours = ma.full_softmax(sim)
    ref_sim = torch.from_numpy(_ref_similarity(mk, ms, qk, qe))[None]
    ref_aff = ref_memory_utils.do_softmax(ref_sim)
    np.testing.assert_allclose(np.asarray(ours), ref_aff[0].numpy().T,
                               rtol=1e-4, atol=1e-6)


def test_topk_softmax_approx_matches_exact():
    """The approx method's support provably contains the exact top-k; on CPU
    lax.approx_max_k is itself exact, so the two paths must agree (including
    usage and the <k-valid-tokens degenerate row)."""
    mk, ms, qk, qe, v = _random_attention_inputs(n=512)
    sim = ma.get_similarity(jnp.asarray(mk), jnp.asarray(ms),
                            jnp.asarray(qk), jnp.asarray(qe))
    for n_valid in (512, 300, 10):  # 10 < top_k: full softmax over valid
        valid = jnp.arange(512) < n_valid
        a_ex, u_ex = ma.topk_softmax(sim, 30, valid, return_usage=True,
                                     method="exact")
        a_ap, u_ap = ma.topk_softmax(sim, 30, valid, return_usage=True,
                                     method="approx")
        np.testing.assert_allclose(np.asarray(a_ap), np.asarray(a_ex),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(u_ap), np.asarray(u_ex),
                                   rtol=1e-4, atol=1e-6)
        assert np.all(np.asarray(a_ap)[:, n_valid:] == 0)
