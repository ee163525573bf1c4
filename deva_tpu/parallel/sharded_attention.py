"""Memory-axis (sequence-parallel) sharded attention.

SURVEY §2.8, sequence-parallelism row: the long-sequence axis of DEVA is the
MEMORY BANK, not the query — if banks outgrow one chip, "shard the
memory-token axis across chips and ring-reduce partial top-k softmax
readouts". The reference has no analog (its banks always fit one GPU;
reference:deva/inference/memory_manager.py:91-169 attends on one device).

This module implements that pattern with XLA collectives over ICI:

  - memory keys/shrinkage/values/validity are sharded over a mesh axis on
    their token dimension; queries are replicated;
  - each device computes its local [Q, N/D] similarity and its local top-k
    candidate VALUES (exact `lax.top_k`, or `lax.approx_max_k` for the TPU
    serving semantics);
  - one `all_gather` of the [Q, k] candidate rows (the only communication —
    proportional to Q·k, never Q·N) gives every device the global k-th
    threshold and row max:
      * exact: the union of per-shard exact top-k contains the global
        top-k, so the k-th of the gathered candidates IS the exact global
        k-th value;
      * approx: any k true array values have min <= the true k-th largest,
        so the threshold support still CONTAINS the exact top-k (the same
        superset argument as deva_tpu/ops/memory_attention.py:topk_softmax);
  - the softmax denominator and the weighted readout are partial sums over
    the local threshold support, combined with `psum` (compiler-scheduled
    over ICI).

Numerically this matches the single-device THRESHOLD semantics exactly up
to summation order (the psum tree vs one flat sum) and k-th-value ties; vs
the reference's exact scatter path the only extra relaxation is that ties
at the k-th value all enter the support. The CPU-mesh test
(tests/test_sharded_attention.py) asserts closeness against the unsharded
implementation for both methods.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deva_tpu.ops import memory_attention as ma


def pad_tokens(n: int, n_shards: int) -> int:
    """Tokens per shard must be equal: round n up to a multiple of
    n_shards (padding rows are masked out via `valid`)."""
    return -(-n // n_shards) * n_shards


def _local_attend(mk_l, ms_l, v_l, valid_l, qk, qe, *, top_k: int,
                  method: str, axis: str, return_usage: bool,
                  has_ms: bool, has_qe: bool):
    """Per-shard body (runs under shard_map). Token-axis args are the local
    shard; qk/qe are replicated."""
    sim = ma.get_similarity(mk_l, ms_l if has_ms else None, qk,
                            qe if has_qe else None,
                            precision=ma.similarity_precision(method))
    sim = jnp.where(valid_l[None, :], sim, -jnp.inf)
    if method == "approx":
        vals_l, _ = jax.lax.approx_max_k(sim, top_k,
                                         recall_target=ma.THRESHOLD_RECALL)
    else:
        vals_l, _ = jax.lax.top_k(sim, top_k)  # [Q, k] local candidates
    # one all-gather of candidate VALUES: [Q, D*k]; global threshold + max
    vals_g = jax.lax.all_gather(vals_l, axis, axis=-1, tiled=True)
    kth = jax.lax.top_k(vals_g, top_k)[0][..., -1:]
    row_max = jnp.max(vals_g, axis=-1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    e = jnp.where(sim >= kth, jnp.exp(sim - row_max), 0.0)  # [Q, N/D]
    denom = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis)
    aff = e / jnp.maximum(denom, 1e-30)
    out = jax.lax.psum(
        jnp.einsum("qn,onc->oqc", aff.astype(v_l.dtype), v_l,
                   preferred_element_type=jnp.float32), axis)
    if return_usage:
        return out, aff.sum(axis=0)  # usage stays sharded [N/D]
    return out


def attend_mem_sharded(mk: jnp.ndarray,
                       ms: Optional[jnp.ndarray],
                       values: jnp.ndarray,
                       qk: jnp.ndarray,
                       qe: Optional[jnp.ndarray],
                       top_k: int,
                       valid: jnp.ndarray,
                       mesh: Mesh,
                       axis: str = "data",
                       method: str = "exact",
                       return_usage: bool = False
                       ) -> Union[jnp.ndarray,
                                  Tuple[jnp.ndarray, jnp.ndarray]]:
    """deva_tpu.ops.memory_attention.attend with the memory token axis
    sharded over `mesh`'s `axis`.

    Semantics caveat: both methods use THRESHOLD support (sim >= global
    k-th), so exact f32 ties at the k-th value all enter the softmax,
    whereas the unsharded 'exact' scatter path keeps exactly k entries.
    Identical outputs (up to psum summation order) whenever the k-th value
    is unique per query row; duplicated memory keys (bitwise-identical
    frames) can differ.

    mk [N, Ck], ms [N] or None, values [O, N, Cv], qk [Q, Ck],
    qe [Q, Ck] or None, valid [N] bool. N must be a multiple of the axis
    size (use pad_tokens + mark the padding rows invalid). Returns
    out [O, Q, Cv] replicated and, if requested, usage [N] (sharded over
    `axis`, like the inputs — usage counters live with their tokens).
    """
    n = mk.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, (n, d)
    assert top_k <= n // d, "top_k must fit in one shard's tokens"
    method = ma.resolve_topk_method(method)  # 'auto'/None -> backend default
    has_ms, has_qe = ms is not None, qe is not None
    # placeholders keep the shard_map signature static; the body ignores
    # them when has_ms/has_qe are False
    ms_in = ms if has_ms else jnp.zeros((n,), jnp.float32)
    qe_in = qe if has_qe else jnp.zeros_like(qk)

    body = functools.partial(_local_attend, top_k=top_k, method=method,
                             axis=axis, return_usage=return_usage,
                             has_ms=has_ms, has_qe=has_qe)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, axis, None), P(axis),
                  P(), P()),
        out_specs=(P(), P(axis)) if return_usage else P(),
        check_vma=False)
    return fn(mk, ms_in, values, valid, qk, qe_in)
