"""Memory-axis sharded attention == unsharded attention on a CPU mesh.

SURVEY §2.8 sequence-parallelism row: shard the memory-token bank over the
mesh, distributed top-k threshold via one [Q, k] all-gather, psum-combined
softmax denominator and readout. The reference has no analog (banks always
fit one GPU); parity target is our own unsharded implementation
(deva_tpu/ops/memory_attention.py), which is itself differential-tested
against reference:deva/model/memory_utils.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.ops import memory_attention as ma
from deva_tpu.parallel.mesh import make_mesh
from deva_tpu.parallel.sharded_attention import attend_mem_sharded, pad_tokens


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return make_mesh(8, 1)


def _inputs(n=1000, q=96, o=3, ck=64, cv=64, n_valid=900, seed=0):
    rng = np.random.default_rng(seed)
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1.0, 4.0, (n,)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((o, n, cv)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0.0, 1.0, (q, ck)), jnp.float32)
    valid = jnp.arange(n) < n_valid
    return mk, ms, v, qk, qe, valid


def test_pad_tokens():
    assert pad_tokens(1000, 8) == 1000
    assert pad_tokens(1001, 8) == 1008
    assert pad_tokens(8, 8) == 8


def test_exact_matches_unsharded(mesh):
    mk, ms, v, qk, qe, valid = _inputs()
    ref, u_ref = ma.attend(mk, ms, v, qk, qe, top_k=30, valid=valid,
                           return_usage=True, method="exact")
    out, usage = attend_mem_sharded(mk, ms, v, qk, qe, 30, valid, mesh,
                                    method="exact", return_usage=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    u_ref, usage = np.asarray(u_ref), np.asarray(usage)
    # affinity rows sum to 1 -> total usage == Q on both sides
    assert np.isclose(usage.sum(), u_ref.sum(), rtol=1e-5)
    np.testing.assert_allclose(usage, u_ref, rtol=1e-4, atol=1e-5)
    # padding/invalid tokens never selected
    assert np.all(usage[900:] == 0.0)


@pytest.mark.parametrize("drop", ["ms", "qe"])
def test_optional_args(mesh, drop):
    mk, ms, v, qk, qe, valid = _inputs(seed=1)
    ms_a = None if drop == "ms" else ms
    qe_a = None if drop == "qe" else qe
    ref = ma.attend(mk, ms_a, v, qk, qe_a, top_k=30, valid=valid,
                    method="exact")
    out = attend_mem_sharded(mk, ms_a, v, qk, qe_a, 30, valid, mesh,
                             method="exact")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_approx_drift_bounded(mesh):
    """The approx sharded threshold (per-shard approx_max_k candidates ->
    global k-th of the gathered values) keeps a support that contains the
    exact top-k; drift vs the exact readout stays within the same budget as
    the unsharded approx path (tests/test_topk_drift.py)."""
    mk, ms, v, qk, qe, valid = _inputs(seed=2)
    exact = np.asarray(ma.attend(mk, ms, v, qk, qe, top_k=30, valid=valid,
                                 method="exact"), np.float32)
    out = np.asarray(attend_mem_sharded(mk, ms, v, qk, qe, 30, valid, mesh,
                                        method="approx"), np.float32)
    scale = np.abs(exact).max()
    assert np.abs(out - exact).max() <= 2e-3 * scale


def test_jit_under_mesh(mesh):
    """The sharded attend composes under jit (one compiled program, XLA
    collectives inside)."""
    mk, ms, v, qk, qe, valid = _inputs(seed=3)

    @jax.jit
    def f(mk, ms, v, qk, qe, valid):
        return attend_mem_sharded(mk, ms, v, qk, qe, 30, valid, mesh,
                                  method="exact")

    out = f(mk, ms, v, qk, qe, valid)
    ref = ma.attend(mk, ms, v, qk, qe, top_k=30, valid=valid, method="exact")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
