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
