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


# --------------------------------------------------------------------------
# attend_pallas_approx (the TPU serving default)
# --------------------------------------------------------------------------

def _rand_attend_inputs(seed, n, q, o, ck, cv, n_valid=None):
    rng = np.random.default_rng(seed)
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 4, (n,)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)), jnp.float32)
    values_om = jnp.asarray(rng.standard_normal((o, n, cv)), jnp.float32)
    values_nm = jnp.transpose(values_om, (1, 0, 2))
    valid = None if n_valid is None else jnp.arange(n) < n_valid
    return mk, ms, qk, qe, values_om, values_nm, valid


def test_attend_pallas_approx_exact_when_single_tile():
    """With N <= 128 the group size is 1, so the threshold equals the exact
    k-th similarity and the approx kernel must match the exact path
    bitwise-closely (no ties in random float data)."""
    from deva_tpu.ops.pallas_attention import attend_pallas_approx
    mk, ms, qk, qe, v_om, v_nm, valid = _rand_attend_inputs(
        10, 120, 70, 2, 32, 16, n_valid=100)
    ref, ref_u = ma.attend(mk, ms, v_om, qk, qe, top_k=12, valid=valid,
                           return_usage=True, method="exact")
    out, usage = attend_pallas_approx(mk, ms, v_nm, qk, qe, top_k=12,
                                      valid=valid, return_usage=True,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(usage), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,q,o,k", [(2048, 300, 3, 30), (700, 130, 2, 12)])
def test_attend_pallas_approx_superset_guarantee(n, q, o, k):
    """Threshold semantics: the support contains the exact top-k, and every
    extra entry weighs no more than the smallest exact-top-k weight. Checked
    via the readout: approx readout = exact readout + small perturbation
    whose magnitude is bounded by the tail mass."""
    from deva_tpu.ops.pallas_attention import attend_pallas_approx
    mk, ms, qk, qe, v_om, v_nm, valid = _rand_attend_inputs(
        11, n, q, o, 64, 32, n_valid=n - n // 7)
    ref = ma.attend(mk, ms, v_om, qk, qe, top_k=k, valid=valid,
                    method="exact")
    out = attend_pallas_approx(mk, ms, v_nm, qk, qe, top_k=k, valid=valid,
                               interpret=True)

    # tail-mass bound from the dense similarity: the extras (at most
    # group_size*k of them at group size 4) each weigh <= the k-th exact
    # weight, so |approx - exact| <= 2 * vmax * (4k * w_k / denom_k)
    sim = np.array(ma.get_similarity(mk, ms, qk, qe))
    sim[:, ~np.asarray(valid)] = -np.inf
    w = np.exp(sim - sim.max(-1, keepdims=True))
    w_sorted = np.sort(w, -1)
    wk = w_sorted[:, -k]
    denom = w_sorted[:, -k:].sum(-1)
    tail_frac = 4 * k * wk / denom
    vmax = np.abs(np.asarray(v_nm)).max()
    bound = tail_frac[None, :, None] * 2 * vmax + 1e-4
    approx32 = np.asarray(out, np.float32)
    exact32 = np.asarray(ref, np.float32)
    assert (np.abs(approx32 - exact32) <= bound).all(), \
        "approx readout drifted beyond the tail-mass bound"


def test_attend_pallas_approx_usage_conserved():
    """Each valid query row's affinity sums to 1, so total usage equals the
    number of valid query rows — including when Q is padded up to the tile."""
    from deva_tpu.ops.pallas_attention import attend_pallas_approx
    mk, ms, qk, qe, v_om, v_nm, valid = _rand_attend_inputs(
        12, 600, 333, 2, 32, 16, n_valid=500)
    out, usage = attend_pallas_approx(mk, ms, v_nm, qk, qe, top_k=8,
                                      valid=valid, return_usage=True,
                                      interpret=True)
    u = np.asarray(usage)
    assert np.isclose(u.sum(), 333, rtol=1e-4), u.sum()
    assert (u[500:] == 0).all(), "invalid tokens must get zero usage"


def test_attend_pallas_approx_fewer_valid_than_k():
    from deva_tpu.ops.pallas_attention import attend_pallas_approx
    mk, ms, qk, qe, v_om, v_nm, valid = _rand_attend_inputs(
        13, 256, 64, 2, 32, 16, n_valid=5)
    ref = ma.attend(mk, ms, v_om, qk, qe, top_k=12, valid=valid,
                    method="exact")
    out = attend_pallas_approx(mk, ms, v_nm, qk, qe, top_k=12, valid=valid,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_attend_pallas_approx_no_qe():
    """qe=None path: a_sq comes from the precomputed sum(mk*mk) row with the
    same accumulation order as the XLA path."""
    from deva_tpu.ops.pallas_attention import attend_pallas_approx
    rng = np.random.default_rng(14)
    n, q, o, ck, cv = 120, 40, 1, 16, 8
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    v_om = jnp.asarray(rng.standard_normal((o, n, cv)), jnp.float32)
    v_nm = jnp.transpose(v_om, (1, 0, 2))
    ref = ma.attend(mk, None, v_om, qk, None, top_k=10, method="exact")
    out = attend_pallas_approx(mk, None, v_nm, qk, None, top_k=10,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attend_pallas_approx_vmap():
    """The batched propagator vmaps the kernels over videos."""
    from deva_tpu.ops.pallas_attention import attend_pallas_approx
    rng = np.random.default_rng(15)
    b, n, q, o, ck, cv, k = 3, 384, 96, 2, 32, 16, 8
    mk = jnp.asarray(rng.standard_normal((b, n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 2, (b, n)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((b, q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (b, q, ck)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, o, cv)), jnp.float32)
    sizes = jnp.asarray([100, 384, 200])
    valid = jnp.arange(n)[None, :] < sizes[:, None]

    fn = jax.vmap(lambda a1, a2, a3, a4, a5, a6: attend_pallas_approx(
        a1, a2, a3, a4, a5, k, valid=a6, interpret=True))
    out = fn(mk, ms, v, qk, qe, valid)
    for i in range(b):
        one = attend_pallas_approx(mk[i], ms[i], v[i], qk[i], qe[i], k,
                                   valid=valid[i], interpret=True)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(one),
                                   rtol=1e-5, atol=1e-5)


def test_attend_pallas_approx_multi_ring_equals_concat():
    """The multi-ring kernel (long-term + working rings without the HBM
    concat) must equal the single-ring kernel on the concatenated rings,
    with per-ring usage splits."""
    from deva_tpu.ops.pallas_attention import (attend_pallas_approx,
                                               attend_pallas_approx_multi)
    rng = np.random.default_rng(16)
    ck, cv, o, k = 32, 16, 2, 8
    n1, n2, q = 512, 768, 200
    mk1 = jnp.asarray(rng.standard_normal((n1, ck)), jnp.float32)
    mk2 = jnp.asarray(rng.standard_normal((n2, ck)), jnp.float32)
    ms1 = jnp.asarray(rng.uniform(1, 3, (n1,)), jnp.float32)
    ms2 = jnp.asarray(rng.uniform(1, 3, (n2,)), jnp.float32)
    v1 = jnp.asarray(rng.standard_normal((n1, o, cv)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((n2, o, cv)), jnp.float32)
    valid1 = jnp.arange(n1) < 300
    valid2 = jnp.arange(n2) < 700
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)), jnp.float32)

    # pin the tile width: the exact-equality premise needs identical token
    # grouping on both sides (the ring boundary n1=512 aligns to the grid)
    out_m, (u1, u2) = attend_pallas_approx_multi(
        [(mk1, ms1, v1, valid1), (mk2, ms2, v2, valid2)], qk, qe, k,
        return_usage=True, n_tile=512, interpret=True)

    out_c, u_c = attend_pallas_approx(
        jnp.concatenate([mk1, mk2]), jnp.concatenate([ms1, ms2]),
        jnp.concatenate([v1, v2]), qk, qe, k,
        valid=jnp.concatenate([valid1, valid2]), return_usage=True,
        n_tile=512, interpret=True)

    # same support definition as long as the ring boundary aligns with the
    # tile grid (n1 % n_tile == 0 here), so results match to float noise
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u_c)[:n1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_c)[n1:],
                               rtol=1e-5, atol=1e-6)
    assert np.isclose(np.asarray(u1).sum() + np.asarray(u2).sum(), q,
                      rtol=1e-4)
