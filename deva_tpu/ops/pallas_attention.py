"""Pallas TPU kernels: fully-fused memory attention — similarity, masked
top-k (exact or threshold-approx), softmax, and readout — without a dense
[Q, N] affinity in HBM.

Behavioral anchor: reference:deva/model/memory_utils.py:27-94 (similarity ->
top-k softmax -> readout), SURVEY §2.7-1 ("fuse as one Pallas kernel ...
never materializing the dense N_mem x HW affinity in HBM").

Two fused paths share one in-VMEM similarity tile builder (`_sim_tile`):

EXACT (`attend_pallas`) — reference top-k semantics:
1. `_sim_topk_kernel` (grid q_tiles x n_tiles): builds each similarity tile
   in VMEM from the key rings (two MXU matmuls of the expanded anisotropic
   L2 form), masks invalid ring slots, and reduces the tile to its EXACT
   top-k (k-step iterative max on the VPU). Only [Q, n_tiles, K] candidates
   reach HBM — ~60x smaller than the dense [Q, N] similarity the XLA path
   writes, reads back for top-k, and reads again for the readout.
2. The global top-k is the top-k of the per-tile candidates (any global
   top-k element is, within its own tile, larger than all but k-1 others,
   so it appears among that tile's top-k) — an exact merge, done in XLA on
   the small candidate tensor. Given identical similarity values the merge
   is exact (ties resolve to the lowest global index, like lax.top_k);
   tiled MXU matmuls can round near-tie similarities 1 ulp differently from
   the dense path, which may swap rank-adjacent selections — the tests
   bound this to <0.1% of indices with no value impact beyond 1e-5.
3. `_readout_kernel` (grid q_tiles x n_tiles): rebuilds each affinity tile
   on the fly in VMEM from the (indices, weights) pairs and feeds the MXU
   directly against the value ring; the usage side-output
   (reference:memory_utils.py:73-74) is an exact [Q, K] -> [N] scatter-add.

APPROX (`attend_pallas_approx`) — the TPU serving default. Threshold
semantics like memory_attention.topk_softmax(method='approx'): the support
{sim >= t} always CONTAINS the exact top-k, and the extra entries carry
weights no larger than the smallest exact-top-k weight. Two kernels over
the (physically concatenated) rings, each rebuilding similarity tiles in
VMEM with ONE K=2*Ck MXU matmul:

A. `_segmax_kernel`: fold each similarity tile to per-group maxima
   (groups of <= 4 lanes; a partition of the token axis), so only
   [Q, N/group] reaches HBM. The row max of the group maxima is the EXACT
   row max; the k-th largest group max is a LOWER bound on the exact k-th
   similarity (each of the top-k lives in some group whose max is >= it),
   so thresholding at it keeps a superset of the exact top-k with at most
   ~k*group_size entries.
BC. `_denom_readout_kernel` (2-phase grid): phase 0 accumulates the softmax
   denominator sum(exp(sim - rowmax) | sim >= t) per query in VMEM scratch;
   phase 1 rebuilds the normalized affinity tiles and runs the MXU readout
   against the value ring (in the ring dtype — bf16 rings feed the MXU
   natively); per-token usage comes out as per-q-tile column-sum partials.

Parity is asserted in tests/test_pallas_attention.py; drift of the approx
path against the exact reference semantics is bounded in
tests/test_topk_drift.py.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Similarity precision for the APPROX passes (Mosaic lowers only DEFAULT /
# HIGHEST): DEFAULT skips the 6-pass HIGHEST f32 emulation the EXACT path
# needs for bitwise XLA parity; the threshold semantics tolerate the extra
# rounding, and the measured on-chip drift vs exact is asserted by
# scripts/probe_attend.py and bounded in tests/test_topk_drift.py.
_APPROX_PRECISION = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# shared: one similarity tile in VMEM
# --------------------------------------------------------------------------

def _sim_tile(qe_ref, qkqe_ref, bsq_ref, mk_ref, msq_ref, msv_ref, vmask_ref,
              *, has_qe: bool,
              precision=jax.lax.Precision.HIGHEST):
    """sim = (2*(qk*qe)@mk^T - a_sq - sum(qe*qk^2)) * ms/sqrt(Ck), masked to
    -inf on invalid ring slots (reference:deva/model/memory_utils.py:27-45,
    tokens-major). a_sq is qe@(mk*mk)^T when selection is present; with
    qe=None it is the HOST-precomputed sum(mk*mk) row (msq_ref), the same
    reduction the XLA path uses — a ones-vector matmul would accumulate in a
    different order and flip near-tie rankings.

    precision: the EXACT path uses HIGHEST so the f32 similarity matches the
    XLA path bitwise (lower precisions decompose f32 into fewer bf16 MXU
    passes, which flips near-tie top-k selections vs the reference). The
    APPROX path uses _APPROX_PRECISION (DEFAULT) — its threshold semantics
    tolerate the rounding, and the HIGHEST emulation costs ~2x MXU time
    across the three sim rebuilds. All approx passes share one precision so
    the threshold from pass A is consistent with passes B/C."""
    mk = mk_ref[:].astype(jnp.float32)
    two_ab = 2.0 * jnp.dot(qkqe_ref[:], mk.T,
                           preferred_element_type=jnp.float32,
                           precision=precision)
    if has_qe:
        a_sq = jnp.dot(qe_ref[:], (mk * mk).T,
                       preferred_element_type=jnp.float32,
                       precision=precision)
    else:
        a_sq = msq_ref[:]  # [1, N_T], broadcasts over the query rows
    sim = (two_ab - a_sq - bsq_ref[:]) * msv_ref[:]
    return jnp.where(vmask_ref[:] > 0, sim, -jnp.inf)


def _prep_inputs(qk, qe, mk, ms, valid, q_tile, n_tile):
    """Common padding/precompute for all kernels. Returns the padded operand
    tuple + geometry. All padded queries/tokens are inert (vmask 0)."""
    q, ck = qk.shape
    n = mk.shape[0]
    n_tile = n_tile if n >= n_tile else _round_up(max(n, 128), 128)
    q_tile = q_tile if q >= q_tile else _round_up(max(q, 8), 8)
    qp, np_ = _round_up(q, q_tile), _round_up(n, n_tile)

    qk = qk.astype(jnp.float32)
    has_qe = qe is not None
    qe_f = qe.astype(jnp.float32) if has_qe else jnp.ones_like(qk)
    qkqe = qk * qe_f
    # the qe=None reference form omits the (per-row constant) b^2 term
    # (reference:deva/model/memory_utils.py:40-45); match its values exactly
    bsq = jnp.sum(qe_f * qk * qk, axis=-1, keepdims=True) if has_qe \
        else jnp.zeros((q, 1), jnp.float32)
    # divide (not multiply-by-reciprocal): bitwise-identical to the XLA
    # path's `sim * (ms / sqrt(ck))` so near-tie rankings match exactly
    msv = (ms.astype(jnp.float32) / math.sqrt(ck)) if ms is not None else \
        jnp.full((n,), 1.0 / math.sqrt(ck), jnp.float32)
    vmask = jnp.ones((n,), jnp.float32) if valid is None else \
        valid.astype(jnp.float32)
    mk_f = mk.astype(jnp.float32)
    # same reduction as memory_attention.get_similarity's qe=None branch
    msq = jnp.sum(mk_f * mk_f, axis=-1)

    ops = (jnp.pad(qe_f, ((0, qp - q), (0, 0))),
           jnp.pad(qkqe, ((0, qp - q), (0, 0))),
           jnp.pad(bsq, ((0, qp - q), (0, 0))),
           jnp.pad(mk_f, ((0, np_ - n), (0, 0))),
           jnp.pad(msq, (0, np_ - n))[None],
           jnp.pad(msv, (0, np_ - n))[None],
           jnp.pad(vmask, (0, np_ - n))[None])
    return ops, has_qe, q_tile, n_tile, qp, np_, ck


def _sim_specs(q_tile, n_tile, ck):
    """BlockSpecs for the 7 `_prep_inputs` operands (every sim-building
    kernel starts with these)."""
    return [
        pl.BlockSpec((q_tile, ck), lambda qi, nj: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_tile, ck), lambda qi, nj: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_tile, 1), lambda qi, nj: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tile, ck), lambda qi, nj: (nj, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile), lambda qi, nj: (0, nj),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile), lambda qi, nj: (0, nj),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile), lambda qi, nj: (0, nj),
                     memory_space=pltpu.VMEM),
    ]


# --------------------------------------------------------------------------
# EXACT path, kernel 1: similarity tiles + per-tile exact top-k
# --------------------------------------------------------------------------

def _sim_topk_kernel(qe_ref, qkqe_ref, bsq_ref, mk_ref, msq_ref, msv_ref,
                     vmask_ref, vals_ref, idx_ref, *, k: int, n_tile: int,
                     has_qe: bool):
    """vals/idx out: [1, Q_T, K] (candidate arrays are tile-major [T, Q, K]
    so the block's trailing dims satisfy the Mosaic (8, 128)-divisible-or-
    full constraint)."""
    sim = _sim_tile(qe_ref, qkqe_ref, bsq_ref, mk_ref, msq_ref, msv_ref,
                    vmask_ref, has_qe=has_qe)
    base = pl.program_id(1) * n_tile
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    vals, idxs = [], []
    for _ in range(k):  # k-step exact extraction (first occurrence on ties,
        # like lax.top_k); argmax spelled as max + min-index for Mosaic
        m = jnp.max(sim, axis=-1)
        am = jnp.min(jnp.where(sim == m[:, None], cols, n_tile), axis=-1)
        vals.append(m)
        idxs.append(am + base)
        sim = jnp.where(cols == am[:, None], -jnp.inf, sim)
    vals_ref[:] = jnp.stack(vals, axis=-1)[None]
    idx_ref[:] = jnp.stack(idxs, axis=-1)[None]


def sim_topk(qk: jnp.ndarray, qe: Optional[jnp.ndarray], mk: jnp.ndarray,
             ms: Optional[jnp.ndarray], valid: Optional[jnp.ndarray],
             top_k: int, *, q_tile: int = 256, n_tile: int = 512,
             interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact masked top-k of the (never-materialized) similarity matrix.
    qk/qe: [Q, Ck]; mk: [N, Ck]; ms: [N] or None; valid: [N] bool or None.
    Returns (values [Q, K] sorted desc, global indices [Q, K])."""
    q = qk.shape[0]
    ops, has_qe, q_tile, n_tile, qp, np_, ck = _prep_inputs(
        qk, qe, mk, ms, valid, q_tile, n_tile)

    t = np_ // n_tile
    grid = (qp // q_tile, t)
    kernel = functools.partial(_sim_topk_kernel, k=top_k, n_tile=n_tile,
                               has_qe=has_qe)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_sim_specs(q_tile, n_tile, ck),
        out_specs=[
            pl.BlockSpec((1, q_tile, top_k), lambda qi, nj: (nj, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, top_k), lambda qi, nj: (nj, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, qp, top_k), jnp.float32),
                   jax.ShapeDtypeStruct((t, qp, top_k), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * qp * np_ * ck + 3 * top_k * qp * np_,
            bytes_accessed=(qp * ck * 8 + np_ * ck * 4 * grid[0] +
                            qp * t * top_k * 8),
            transcendentals=0),
        interpret=interpret,
    )(*ops)

    # exact merge: global top-k = top-k of the per-tile top-k candidates.
    # Candidates are flattened tile-major and rank-minor, so value ties
    # resolve to the lowest global index — identical to lax.top_k on the
    # dense similarity.
    cand_v = vals.transpose(1, 0, 2)[:q].reshape(q, t * top_k)
    cand_i = idx.transpose(1, 0, 2)[:q].reshape(q, t * top_k)
    gv, gp = jax.lax.top_k(cand_v, top_k)
    gi = jnp.take_along_axis(cand_i, gp, axis=-1)
    return gv, gi


# --------------------------------------------------------------------------
# EXACT path, kernel 2: sparse readout (affinity tiles rebuilt in VMEM)
# --------------------------------------------------------------------------

def _readout_kernel(idx_ref, w_ref, v_ref, out_ref, acc_ref, *, k: int,
                    n_tile: int):
    """idx/w: [Q_T, K] (same q-tile for every n step); v: [N_T, C_T];
    out: [Q_T, C_T]; acc: VMEM scratch [Q_T, C_T] f32."""
    nj = pl.program_id(1)

    @pl.when(nj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = nj * n_tile
    local = idx_ref[:] - base  # [Q_T, K]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_tile), 2)
    hit = (local[:, :, None] == cols)  # [Q_T, K, N_T]
    aff = jnp.sum(jnp.where(hit, w_ref[:][:, :, None], 0.0),
                  axis=1)  # [Q_T, N_T]
    acc_ref[:] += jnp.dot(aff.astype(v_ref.dtype), v_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(nj == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def topk_readout(indices: jnp.ndarray, weights: jnp.ndarray,
                 values: jnp.ndarray, *, q_tile: int = 256,
                 n_tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """indices/weights: [Q, K] (top-k token ids and softmax weights);
    values: [N, C] (token-major, C = O*Cv flattened). Returns [Q, C] f32.
    Q, N, C must be multiples of the tile sizes (pad beforehand)."""
    q, k = indices.shape
    n, c = values.shape
    assert q % q_tile == 0 and n % n_tile == 0, (q, n)
    grid = (q // q_tile, n // n_tile)
    kernel = functools.partial(_readout_kernel, k=k, n_tile=n_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, k), lambda qi, nj: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda qi, nj: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, c), lambda qi, nj: (nj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, c), lambda qi, nj: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((q_tile, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * c + q * k * n,
            bytes_accessed=values.size * values.dtype.itemsize +
            q * c * 4 + q * k * 8,
            transcendentals=0),
        interpret=interpret,
    )(indices.astype(jnp.int32), weights.astype(jnp.float32), values)


# --------------------------------------------------------------------------
# the fused EXACT path
# --------------------------------------------------------------------------

def attend_pallas(mk: jnp.ndarray, ms: Optional[jnp.ndarray],
                  values: jnp.ndarray, qk: jnp.ndarray,
                  qe: Optional[jnp.ndarray], top_k: int,
                  valid: Optional[jnp.ndarray] = None,
                  return_usage: bool = False, *, interpret: bool = False):
    """Drop-in replacement for deva_tpu.ops.memory_attention.attend with
    EXACT top-k semantics and no dense [Q, N] affinity in HBM.
    values: [N, O, Cv] token-major. Returns [O, Q, Cv] (f32) and optionally
    the per-token usage [N]."""
    n, o, cv = values.shape
    q = qk.shape[0]

    gv, gi = sim_topk(qk, qe, mk, ms, valid, top_k, interpret=interpret)

    # softmax over the k selected values; shifting by the row max is
    # mathematically identical to the reference's unshifted exp
    # (reference:memory_utils.py:59-60) and removes its all-underflow NaN
    row_max = gv[..., :1]
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    x_exp = jnp.exp(gv - row_max)
    w = x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)

    # pad to tile multiples; padded queries gather token 0 with weight 0,
    # padded tokens are never indexed
    n_tile = 512 if n >= 512 else _round_up(n, 128)
    q_tile = 256 if q >= 256 else _round_up(q, 8)
    qp = _round_up(q, q_tile)
    np_ = _round_up(n, n_tile)
    cp = _round_up(o * cv, 128)
    idx_p = jnp.pad(gi, ((0, qp - q), (0, 0)))
    w_p = jnp.pad(w, ((0, qp - q), (0, 0)))
    v2 = values.reshape(n, o * cv)
    v_p = jnp.pad(v2, ((0, np_ - n), (0, cp - o * cv)))

    out = topk_readout(idx_p, w_p, v_p, q_tile=q_tile, n_tile=n_tile,
                       interpret=interpret)
    out = out[:q, :o * cv].reshape(q, o, cv).transpose(1, 0, 2)
    if return_usage:
        usage = jnp.zeros((n,), jnp.float32).at[gi.reshape(-1)].add(
            w.reshape(-1), mode="drop")
        return out, usage
    return out


# --------------------------------------------------------------------------
# APPROX path (v3): 2 kernels over the concatenated rings
# --------------------------------------------------------------------------
#
# v3 layout notes (why this differs from the EXACT path's sim form):
# - ONE MXU matmul per similarity tile: with selection present,
#   sim_pre = [2*(qk*qe) ; -qe] @ [mk ; mk*mk]^T  (K = 2*Ck = 128 — fills
#   the 128-lane MXU; the EXACT path's two K=64 matmuls run half-empty).
#   Then sim = (sim_pre - sum(qe*qk^2)) * ms/sqrt(Ck). Accumulation order
#   differs from the XLA path (one 128-term sum), which the threshold
#   semantics tolerate; the EXACT kernel keeps the two-matmul HIGHEST form
#   for bitwise parity.
# - The rings ([long-term ; working]) are PHYSICALLY concatenated in XLA
#   first: the copy is ~0.1 ms at serving shapes and buys a single kernel
#   sweep + in-kernel denominators; the dense [Q, N] affinity still never
#   exists in HBM (SURVEY §2.7-1).
# - Pass A (_segmax_kernel): per-group (<=4 lanes) maxima -> threshold via
#   approx_max_k in XLA.
# - Pass BC (_denom_readout_kernel): a 2-phase grid (qi, phase, nj); phase 0
#   accumulates the softmax denominator in VMEM scratch, phase 1 rebuilds
#   the normalized affinity tiles and feeds the MXU readout + usage
#   column sums. Denominators never round-trip to HBM.


def _prep2(qk, qe, mk, ms, valid, q_tile, n_tile):
    """v3 operand prep: (qcat, mcat, bsq, msq, msv, vmask) padded."""
    q, ck = qk.shape
    n = mk.shape[0]
    n_tile = n_tile if n >= n_tile else _round_up(max(n, 128), 128)
    q_tile = q_tile if q >= q_tile else _round_up(max(q, 8), 8)
    qp, np_ = _round_up(q, q_tile), _round_up(n, n_tile)

    qk = qk.astype(jnp.float32)
    mk_f = mk.astype(jnp.float32)
    has_qe = qe is not None
    if has_qe:
        qe_f = qe.astype(jnp.float32)
        qcat = jnp.concatenate([2.0 * qk * qe_f, -qe_f], axis=-1)
        mcat = jnp.concatenate([mk_f, mk_f * mk_f], axis=-1)
        bsq = jnp.sum(qe_f * qk * qk, axis=-1, keepdims=True)
    else:
        qcat = 2.0 * qk
        mcat = mk_f
        bsq = jnp.zeros((q, 1), jnp.float32)
    msv = (ms.astype(jnp.float32) / math.sqrt(ck)) if ms is not None else \
        jnp.full((n,), 1.0 / math.sqrt(ck), jnp.float32)
    vmask = jnp.ones((n,), jnp.float32) if valid is None else \
        valid.astype(jnp.float32)
    # qe=None keeps the a_sq row outside the matmul — the same sum(mk*mk)
    # reduction the XLA path uses
    msq = jnp.sum(mk_f * mk_f, axis=-1) if not has_qe else \
        jnp.zeros((n,), jnp.float32)

    ops = (jnp.pad(qcat, ((0, qp - q), (0, 0))),
           jnp.pad(mcat, ((0, np_ - n), (0, 0))),
           jnp.pad(bsq, ((0, qp - q), (0, 0))),
           jnp.pad(msq, (0, np_ - n))[None],
           jnp.pad(msv, (0, np_ - n))[None],
           jnp.pad(vmask, (0, np_ - n))[None])
    return ops, has_qe, q_tile, n_tile, qp, np_, qcat.shape[-1]


def _sim_tile2(qcat_ref, mcat_ref, bsq_ref, msq_ref, msv_ref, vmask_ref, *,
               has_qe: bool):
    sim = jnp.dot(qcat_ref[:], mcat_ref[:].T,
                  preferred_element_type=jnp.float32,
                  precision=_APPROX_PRECISION)
    if has_qe:
        sim = (sim - bsq_ref[:]) * msv_ref[:]
    else:
        sim = (sim - msq_ref[:]) * msv_ref[:]
    return jnp.where(vmask_ref[:] > 0, sim, -jnp.inf)


def _sim_specs2(q_tile, n_tile, kc, extra_grid_dims=0):
    """BlockSpecs for the 6 _prep2 operands. index maps take (qi, ..., nj)
    with `extra_grid_dims` dims between."""
    if extra_grid_dims == 0:
        qmap = lambda qi, nj: (qi, 0)
        nmap_k = lambda qi, nj: (nj, 0)
        nmap_r = lambda qi, nj: (0, nj)
    else:
        qmap = lambda qi, ph, nj: (qi, 0)
        nmap_k = lambda qi, ph, nj: (nj, 0)
        nmap_r = lambda qi, ph, nj: (0, nj)
    return [
        pl.BlockSpec((q_tile, kc), qmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tile, kc), nmap_k, memory_space=pltpu.VMEM),
        pl.BlockSpec((q_tile, 1), qmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile), nmap_r, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile), nmap_r, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile), nmap_r, memory_space=pltpu.VMEM),
    ]


def _segmax_kernel(qcat_ref, mcat_ref, bsq_ref, msq_ref, msv_ref, vmask_ref,
                   out_ref, *, folds: int, has_qe: bool):
    """Fold the [Q_T, N_T] similarity tile in half `folds` times: out column
    g is the max over the group {g, g+W, g+2W, ...} (W = N_T >> folds) — a
    partition of the tile's tokens, so max over groups == exact row max."""
    sim = _sim_tile2(qcat_ref, mcat_ref, bsq_ref, msq_ref, msv_ref,
                     vmask_ref, has_qe=has_qe)
    for _ in range(folds):
        half = sim.shape[1] // 2
        sim = jnp.maximum(sim[:, :half], sim[:, half:])
    out_ref[:] = sim


def _segmax_pass(ops, grid, q_tile, n_tile, kc, qp, np_, has_qe, interpret):
    """Pass A: [Qp, N/group] group maxima of the similarity. The group size
    is capped at 4 regardless of tile width (bigger groups loosen the
    threshold — extras scale with group_size*k) while keeping the output
    block lane count >= 128 (Mosaic divisibility)."""
    folds = 0
    for f in (2, 1):  # largest group <= 4 with a 128-divisible output block
        if (n_tile >> f) % 128 == 0 and (n_tile >> f) > 0:
            folds = f
            break
    nseg_tile = n_tile >> folds
    nseg = grid[1] * nseg_tile
    return pl.pallas_call(
        functools.partial(_segmax_kernel, folds=folds, has_qe=has_qe),
        grid=grid,
        in_specs=_sim_specs2(q_tile, n_tile, kc),
        out_specs=pl.BlockSpec((q_tile, nseg_tile), lambda qi, nj: (qi, nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, nseg), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * kc + qp * np_,
            bytes_accessed=np_ * kc * 4 * grid[0] + qp * nseg * 4,
            transcendentals=0),
        interpret=interpret,
    )(*ops)


def _denom_readout_kernel(qcat_ref, mcat_ref, bsq_ref, msq_ref, msv_ref,
                          vmask_ref, rmax_ref, th_ref, qvalid_ref, v_ref,
                          out_ref, use_ref, den_ref, acc_ref, *,
                          has_qe: bool):
    """2-phase grid (qi, phase, nj). Phase 0: accumulate the softmax
    denominator over the threshold support into VMEM scratch. Phase 1: the
    normalized affinity tile -> MXU readout + usage column sums. sim is
    -inf on invalid slots and rmax is clamped finite, so exp never sees
    inf-inf."""
    ph = pl.program_id(1)
    nj = pl.program_id(2)

    sim = _sim_tile2(qcat_ref, mcat_ref, bsq_ref, msq_ref, msv_ref,
                     vmask_ref, has_qe=has_qe)
    e = jnp.where(sim >= th_ref[:], jnp.exp(sim - rmax_ref[:]), 0.0)

    @pl.when((ph == 0) & (nj == 0))
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(ph == 0)
    def _():
        den_ref[:] += jnp.sum(e, axis=-1, keepdims=True)

    @pl.when(ph == 1)
    def _():
        @pl.when(nj == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # padded query rows build real similarities (their pads are zeros,
        # not -inf): qvalid zeroes their affinity, killing both their
        # readout rows and their usage contributions
        invd = qvalid_ref[:] / jnp.maximum(den_ref[:], 1e-30)
        aff = e * invd
        # usage partial: per-q-tile column sums (summed over q-tiles in
        # XLA) — exact affinity.sum(axis=0) given this support
        # (reference:memory_utils.py:73-74). [1, 1, N_T] block so Mosaic's
        # last-two-dims constraint sees (1-full, N_T).
        use_ref[:] = jnp.sum(aff, axis=0)[None, None]
        acc_ref[:] += jnp.dot(aff.astype(v_ref.dtype), v_ref[:],
                              preferred_element_type=jnp.float32)

        @pl.when(nj == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:]


def _denom_readout_pass(ops, rmax, th, qvalid, values, n, grid, q_tile,
                        n_tile, kc, qp, np_, has_qe, interpret):
    o, cv = values.shape[1:]
    cp = _round_up(o * cv, 128)
    v_p = jnp.pad(values.reshape(n, o * cv), ((0, np_ - n), (0, cp - o * cv)))
    n_qt = qp // q_tile
    grid3 = (grid[0], 2, grid[1])
    qrow = [pl.BlockSpec((q_tile, 1), lambda qi, ph, nj: (qi, 0),
                         memory_space=pltpu.VMEM)] * 3
    out, use_part = pl.pallas_call(
        functools.partial(_denom_readout_kernel, has_qe=has_qe),
        grid=grid3,
        in_specs=_sim_specs2(q_tile, n_tile, kc, extra_grid_dims=1) + qrow + [
            # phase 0 parks on value block 0 (no readout there), phase 1
            # streams the real blocks
            pl.BlockSpec((n_tile, cp), lambda qi, ph, nj: (nj * ph, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, cp), lambda qi, ph, nj: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_tile), lambda qi, ph, nj: (qi, 0, nj),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((qp, cp), jnp.float32),
                   jax.ShapeDtypeStruct((n_qt, 1, np_), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((q_tile, 1), jnp.float32),
                        pltpu.VMEM((q_tile, cp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * qp * np_ * kc) + 2 * qp * np_ * cp + 6 * qp * np_,
            bytes_accessed=(np_ * kc * 4 * grid[0] * 2 +
                            np_ * cp * values.dtype.itemsize * n_qt +
                            qp * cp * 4 + n_qt * np_ * 4),
            transcendentals=2 * qp * np_),
        interpret=interpret,
    )(*ops, rmax, th, qvalid, v_p)
    return out[:, :o * cv], use_part


def attend_pallas_approx_multi(rings, qk: jnp.ndarray,
                               qe: Optional[jnp.ndarray], top_k: int,
                               return_usage: bool = False, *,
                               q_tile: int = 256, n_tile=None,
                               interpret: bool = False):
    """Threshold-approx fused attention over SEVERAL memory rings at once —
    the serving shape is [long-term ring ; working ring]
    (reference:deva/inference/memory_manager.py:107-134). The rings are
    concatenated on the token axis (a ~0.1 ms stream at serving shapes) and
    swept by the two v3 kernels; per-ring usage splits back afterwards. The
    dense [Q, N] affinity never materializes in HBM.

    rings: sequence of (mk [N,Ck], ms [N]|None, values [N,O,Cv],
    valid [N]|None). Returns (out [O,Q,Cv], [usage_0, usage_1, ...]) with
    one usage array per ring when return_usage."""
    q = qk.shape[0]
    o, cv = rings[0][2].shape[1:]
    lens = [r[0].shape[0] for r in rings]

    if len(rings) == 1:
        mk, ms, values, valid = rings[0]
    else:
        mk = jnp.concatenate([r[0] for r in rings])
        ms = None if all(r[1] is None for r in rings) else jnp.concatenate(
            [r[1] if r[1] is not None else jnp.ones((r[0].shape[0],),
                                                    r[0].dtype)
             for r in rings])
        values = jnp.concatenate([r[2] for r in rings])
        valid = None if all(r[3] is None for r in rings) else \
            jnp.concatenate(
                [r[3] if r[3] is not None
                 else jnp.ones((r[0].shape[0],), bool) for r in rings])
    n = mk.shape[0]

    if n_tile is None:
        # adaptive tile width: per-grid-step fixed costs (DMA setup,
        # semaphores) matter at 512-wide tiles on serving shapes; use the
        # widest tile whose double-buffered value block fits the VMEM
        # budget (pass BC holds [n_tile, cp] x2 + accumulators)
        cp = _round_up(o * cv, 128)
        row_bytes = cp * values.dtype.itemsize
        n_tile = 1024 if row_bytes <= 3072 else 512

    ops, has_qe, q_tile, n_tile, qp, np_, kc = _prep2(
        qk, qe, mk, ms, valid, q_tile, n_tile)
    grid = (qp // q_tile, np_ // n_tile)

    segmax = _segmax_pass(ops, grid, q_tile, n_tile, kc, qp, np_, has_qe,
                          interpret)
    # exact row max (group maxima partition the tokens); clamped finite so
    # rows with zero valid tokens stay NaN-free like the XLA paths
    rmax = jnp.max(segmax, axis=-1, keepdims=True)
    rmax = jnp.where(jnp.isfinite(rmax), rmax, 0.0)
    # threshold: the k-th largest group max — a lower bound on the exact
    # k-th similarity, so {sim >= th} is a superset of the exact top-k.
    # approx_max_k's k-th value is <= the true k-th group max (recall<1 only
    # ever lowers it), which only grows the superset.
    nseg = segmax.shape[-1]
    kk = min(top_k, nseg)
    if nseg >= 4 * top_k and not interpret:
        # high recall keeps the threshold tight (each miss lowers the
        # threshold and admits another ~group_size of small tail weights)
        seg_vals, _ = jax.lax.approx_max_k(segmax, kk, recall_target=0.99)
    else:
        seg_vals, _ = jax.lax.top_k(segmax, kk)
    th = seg_vals[:, -1:]
    qvalid = (jnp.arange(qp) < q).astype(jnp.float32)[:, None]

    out, use_part = _denom_readout_pass(ops, rmax, th, qvalid, values, n,
                                        grid, q_tile, n_tile, kc, qp, np_,
                                        has_qe, interpret)
    out = out[:q].reshape(q, o, cv).transpose(1, 0, 2)
    if return_usage:
        usage = jnp.sum(use_part, axis=(0, 1))[:n]
        offs = np.cumsum([0] + lens)
        usages = [usage[offs[i]:offs[i + 1]] for i in range(len(rings))]
        return out, usages
    return out



def attend_pallas_approx(mk: jnp.ndarray, ms: Optional[jnp.ndarray],
                         values: jnp.ndarray, qk: jnp.ndarray,
                         qe: Optional[jnp.ndarray], top_k: int,
                         valid: Optional[jnp.ndarray] = None,
                         return_usage: bool = False, *,
                         q_tile: int = 256, n_tile=None,
                         interpret: bool = False):
    """Fused threshold-approx attention (TPU serving default; see module
    docstring). Same signature/layout as attend_pallas. Guarantee: the
    support contains the exact top-k; extra entries each weigh no more than
    the smallest exact-top-k weight. When N <= 128 the group size is 1 and
    the result is EXACT (ties included)."""
    res = attend_pallas_approx_multi([(mk, ms, values, valid)], qk, qe,
                                     top_k, return_usage, q_tile=q_tile,
                                     n_tile=n_tile, interpret=interpret)
    if return_usage:
        out, usages = res
        return out, usages[0]
    return res
