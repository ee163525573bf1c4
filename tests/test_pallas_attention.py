"""Pallas top-k readout kernel vs the XLA reference path (interpret mode on
the CPU test platform; the TPU path is exercised by bench/e2e runs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.ops import memory_attention as ma
from deva_tpu.ops.pallas_attention import attend_pallas, topk_readout


@pytest.mark.parametrize("n,q,o", [(512, 256, 2), (1024, 512, 4)])
def test_topk_readout_matches_dense(n, q, o):
    rng = np.random.default_rng(0)
    k, cv = 16, 64
    idx = rng.integers(0, n, (q, k)).astype(np.int32)
    w = rng.uniform(0, 1, (q, k)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    values = rng.standard_normal((n, o * cv)).astype(np.float32)

    out = topk_readout(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(values),
                       q_tile=128, n_tile=256, interpret=True)

    dense = np.zeros((q, n), np.float32)
    np.add.at(dense, (np.arange(q)[:, None], idx), w)
    ref = dense @ values
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_attend_pallas_matches_xla():
    rng = np.random.default_rng(1)
    n, q, o, ck, cv = 700, 300, 3, 64, 32
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 4, (n,)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)), jnp.float32)
    values_om = jnp.asarray(rng.standard_normal((o, n, cv)), jnp.float32)
    values_nm = jnp.transpose(values_om, (1, 0, 2))  # token-major
    valid = jnp.arange(n) < 600

    ref, ref_usage = ma.attend(mk, ms, values_om, qk, qe, top_k=12,
                               valid=valid, return_usage=True)
    out, usage = attend_pallas(mk, ms, values_nm, qk, qe, top_k=12,
                               valid=valid, return_usage=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(usage), np.asarray(ref_usage),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,q,k", [(700, 130, 12), (2000, 300, 30),
                                   (150, 40, 30)])
def test_sim_topk_exact_vs_dense(n, q, k):
    """The fused similarity+top-k kernel must select exactly the same
    (values, indices) as lax.top_k over the dense similarity — including
    masked slots and index-order tie resolution."""
    from deva_tpu.ops.pallas_attention import sim_topk
    rng = np.random.default_rng(2)
    ck = 64
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 4, (n,)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)), jnp.float32)
    valid = jnp.arange(n) < (n - n // 8)

    sim = ma.get_similarity(mk, ms, qk, qe)
    sim = jnp.where(valid[None, :], sim, -jnp.inf)
    ref_v, ref_i = jax.lax.top_k(sim, k)

    gv, gi = sim_topk(qk, qe, mk, ms, valid, k, interpret=True)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
    # tiled matmuls round 1 ulp differently from the dense one, which can
    # swap rank-adjacent entries whose similarities differ by <1e-5; any
    # index mismatch must be such a value-tie (the allclose above bounds the
    # value impact), and there may only be a handful of them
    mism = np.asarray(gi) != np.asarray(ref_i)
    assert mism.mean() < 1e-3, f"{mism.sum()} index mismatches"


def test_sim_topk_ties_resolve_to_lowest_index():
    """Duplicate memory tokens (exact similarity ties) must select the same
    indices as lax.top_k (lowest index first), across tile boundaries."""
    from deva_tpu.ops.pallas_attention import sim_topk
    rng = np.random.default_rng(3)
    ck, k = 16, 4
    base = rng.standard_normal((10, ck)).astype(np.float32)
    mk = jnp.asarray(np.tile(base, (30, 1)))  # 300 tokens, 30x duplicated
    qk = jnp.asarray(rng.standard_normal((16, ck)), jnp.float32)

    sim = ma.get_similarity(mk, None, qk, None)
    ref_v, ref_i = jax.lax.top_k(sim, k)
    gv, gi = sim_topk(qk, None, mk, None, None, k, interpret=True)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ref_v),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ref_i))


def test_attend_pallas_fewer_valid_than_k():
    """Rows with fewer valid tokens than k degrade to a softmax over the
    valid ones, like the XLA exact path."""
    rng = np.random.default_rng(4)
    n, q, o, ck, cv = 256, 64, 2, 32, 16
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 2, (n,)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)), jnp.float32)
    values_om = jnp.asarray(rng.standard_normal((o, n, cv)), jnp.float32)
    values_nm = jnp.transpose(values_om, (1, 0, 2))
    valid = jnp.arange(n) < 5  # fewer than top_k=12

    ref = ma.attend(mk, ms, values_om, qk, qe, top_k=12, valid=valid,
                    method="exact")
    out = attend_pallas(mk, ms, values_nm, qk, qe, top_k=12, valid=valid,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
