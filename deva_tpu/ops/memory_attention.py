"""Memory-attention math: anisotropic L2 similarity, top-k softmax, readout.

Behavioral anchor: reference:deva/model/memory_utils.py:6-94. The reference is
channel-first ([C, N]); deva_tpu is tokens-first ([N, C]) which is the natural
MXU layout (tokens on the sublane axis, channels on the lane axis).

Similarity (XMem appendix): for memory key a (with shrinkage s) and query key b
with per-channel selection e:
    sim(a, b) = -s * sum_c e_c (a_c - b_c)^2 / sqrt(Ck)
expanded into two matmuls:  -a^2·e + 2 a·(b e) - sum(e b^2).

This module is the always-correct XLA implementation; a fused Pallas kernel
(deva_tpu/ops/pallas_attention.py) implements the single-bucket hot path.

All functions take an optional token-validity mask so memory lives in
fixed-shape ring buffers: invalid tokens get -inf similarity and can never be
selected by top-k, making the fixed-shape result exactly equal to the
dynamic-shape reference computation on the valid prefix.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_similarity(mk: jnp.ndarray,
                   ms: Optional[jnp.ndarray],
                   qk: jnp.ndarray,
                   qe: Optional[jnp.ndarray],
                   precision: Optional[jax.lax.Precision] = None
                   ) -> jnp.ndarray:
    """Pairwise similarity between memory and query tokens.

    mk: [N, Ck] memory keys;  ms: [N] shrinkage (or None)
    qk: [Q, Ck] query keys;   qe: [Q, Ck] selection (or None)
    returns sim: [Q, N]   (query-major: top-k reduces the last axis)

    reference:deva/model/memory_utils.py:6-45 (transposed layout).

    precision defaults to HIGHEST: true f32 matmuls (TPU f32 dots otherwise
    decompose into fewer bf16 passes): similarity ranking feeds a top-k,
    where precision loss flips near-tie selections and breaks reference
    parity. The approx-threshold serving path passes HIGH (3-pass bf16,
    ~1e-6 relative of true f32 — twice the MXU rate; the threshold support
    is soft there, so near-tie flips at 1e-6 are indistinguishable from the
    approx drift already bounded by tests/test_topk_drift.py).
    """
    ck = mk.shape[-1]
    mk = mk.astype(jnp.float32)
    qk = qk.astype(jnp.float32)
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    dot = lambda a, b: jax.lax.dot(a, b, precision=precision)
    if qe is not None:
        qe = qe.astype(jnp.float32)
        # [Q, N] = (qe @ mk^2.T); two_ab = 2 (qk*qe) @ mk.T; b_sq rowwise
        a_sq = dot(qe, (mk * mk).T)
        two_ab = 2.0 * dot(qk * qe, mk.T)
        b_sq = jnp.sum(qe * qk * qk, axis=-1, keepdims=True)
        sim = -a_sq + two_ab - b_sq
    else:
        a_sq = jnp.sum(mk * mk, axis=-1)[None, :]
        two_ab = 2.0 * dot(qk, mk.T)
        sim = -a_sq + two_ab

    if ms is not None:
        sim = sim * (ms.astype(jnp.float32)[None, :] / math.sqrt(ck))
    else:
        sim = sim / math.sqrt(ck)
    return sim


_DEFAULT_TOPK_METHOD: Optional[str] = None

# recall_target for the approx-threshold approx_max_k. The k-th returned
# value is a true array value and there are k of them, so it lower-bounds the
# exact k-th for ANY recall — the threshold support always contains the exact
# top-k. Lower recall only shrinks the PartialReduce output (the final
# full-sort of that output dominated the op: 8.4 ms/iter at l=1152/recall
# 0.95 vs ~0 at l=256/recall 0.8 at the [16,1620,16712] serving shape,
# scripts/probe_recall.py) at the price of a slightly wider support whose
# extra entries carry weights no larger than the smallest exact-top-k weight
# (drift bounded by tests/test_topk_drift.py).
THRESHOLD_RECALL = 0.8


def default_topk_method() -> str:
    """'approx' on TPU, 'exact' elsewhere. jax.lax.top_k over a large token
    axis lowers to a full sort on TPU (~280 ms at [8x1620, 21060] on v5e —
    measured, scripts/probe_topk.py) while lax.approx_max_k uses the TPU's
    native PartialReduce (~15 ms). CPU (tests, golden parity) stays exact."""
    global _DEFAULT_TOPK_METHOD
    if _DEFAULT_TOPK_METHOD is None:
        _DEFAULT_TOPK_METHOD = ("approx" if jax.default_backend() == "tpu"
                                else "exact")
    return _DEFAULT_TOPK_METHOD


def resolve_topk_method(method: Optional[str]) -> str:
    if method in (None, "auto"):
        return default_topk_method()
    assert method in ("exact", "approx"), method
    return method


def similarity_precision(method: Optional[str]) -> jax.lax.Precision:
    """Dot precision for get_similarity given the top-k method: exact parity
    needs true f32 (HIGHEST); the approx-threshold path runs HIGH (see
    get_similarity docstring)."""
    return (jax.lax.Precision.HIGH
            if resolve_topk_method(method) == "approx"
            else jax.lax.Precision.HIGHEST)


def topk_softmax(sim: jnp.ndarray,
                 top_k: int,
                 valid: Optional[jnp.ndarray] = None,
                 return_usage: bool = False,
                 method: Optional[str] = "auto"):
    """Top-k-restricted softmax over the token axis (last axis of [Q, N]).

    method='exact' matches reference:deva/model/memory_utils.py:48-76: select
    top_k entries per query, exponentiate, normalize, scatter back to a dense
    [Q, N] affinity.

    method='approx' (TPU serving default) thresholds the dense similarity at
    the approx-top-k k-th value instead: since any k returned values have
    their minimum <= the true k-th largest, the support {sim >= kth} always
    CONTAINS the exact top-k; the (rare) extra entries carry weights no
    larger than the smallest exact-top-k weight. No sort, no scatter — just
    lax.approx_max_k (native TPU PartialReduce) plus elementwise passes.

    valid: [N] bool; invalid tokens are masked to -inf (exp -> 0 exactly).
    usage (if requested): affinity summed over queries, per token: [N].
    """
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, -jnp.inf)
    q, n = sim.shape
    if resolve_topk_method(method) == "approx" and n >= 4 * top_k:
        vals, _ = jax.lax.approx_max_k(sim, top_k,
                                       recall_target=THRESHOLD_RECALL)
        kth = vals[..., -1:]
        row_max = vals[..., :1]
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
        # sim >= -inf is True, so rows with < k valid tokens degrade to a
        # full softmax over the valid ones — same as the exact path.
        e = jnp.where(sim >= kth, jnp.exp(sim - row_max), 0.0)
        affinity = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        if return_usage:
            return affinity, affinity.sum(axis=0)
        return affinity
    values, indices = jax.lax.top_k(sim, top_k)  # [Q, K]
    # The reference exponentiates without max subtraction (sim <= 0 so exp
    # never overflows, reference:memory_utils.py:59-60) — but it can
    # UNDERFLOW to an all-zero row (sim < -88 for every candidate), giving
    # 0/0 = NaN. Shifting by the row max is mathematically identical
    # (softmax shift invariance) and removes that failure mode.
    row_max = values[..., :1]
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    x_exp = jnp.exp(values - row_max)  # exp(-inf - c) == 0
    x_exp = x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)
    affinity = jnp.zeros((q, n), dtype=x_exp.dtype)
    affinity = affinity.at[jnp.arange(q)[:, None], indices].add(x_exp)
    if return_usage:
        return affinity, affinity.sum(axis=0)
    return affinity


def full_softmax(sim: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense softmax over the token axis (training path / consolidation).

    reference:deva/model/memory_utils.py:66-70 (with max subtraction)."""
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, -jnp.inf)
    maxes = jnp.max(sim, axis=-1, keepdims=True)
    x_exp = jnp.exp(sim - maxes)
    return x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)


def readout(affinity: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Weighted readout of memory values.

    affinity: [Q, N]; values: [..., N, Cv] -> out [..., Q, Cv] (f32).
    reference:deva/model/memory_utils.py:87-94 (transposed layout).
    bf16 value rings run the matmul in bf16 (full-rate MXU, f32 accumulate)
    — the affinity is cast DOWN rather than the values up, matching
    memory.py:_readout_token_major; f32 rings stay f32 exactly.
    """
    return jnp.einsum("qn,...nc->...qc", affinity.astype(values.dtype),
                      values, preferred_element_type=jnp.float32)


def attend(mk: jnp.ndarray,
           ms: Optional[jnp.ndarray],
           values: jnp.ndarray,
           qk: jnp.ndarray,
           qe: Optional[jnp.ndarray],
           top_k: int,
           valid: Optional[jnp.ndarray] = None,
           return_usage: bool = False,
           method: Optional[str] = "auto"):
    """similarity -> top-k softmax -> readout, in one call.

    mk [N, Ck], ms [N], values [O, N, Cv], qk [Q, Ck], qe [Q, Ck]
    returns out [O, Q, Cv] (f32) and optionally usage [N].
    """
    sim = get_similarity(mk, ms, qk, qe, precision=similarity_precision(method))
    if return_usage:
        affinity, usage = topk_softmax(sim, top_k, valid, return_usage=True,
                                       method=method)
        return readout(affinity, values), usage
    affinity = topk_softmax(sim, top_k, valid, method=method)
    return readout(affinity, values)
