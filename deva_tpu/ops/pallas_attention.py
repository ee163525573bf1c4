"""Pallas TPU kernels: fully-fused memory attention — similarity, masked
top-k, softmax, and readout — without a dense [Q, N] affinity in HBM.

Behavioral anchor: reference:deva/model/memory_utils.py:27-94 (similarity ->
top-k softmax -> readout), SURVEY §2.7-1 ("fuse as one Pallas kernel ...
never materializing the dense N_mem x HW affinity in HBM").

Two kernels, glued by tiny [Q, K]-shaped XLA ops:

1. `_sim_topk_kernel` (grid q_tiles x n_tiles): builds each similarity tile
   in VMEM from the key rings (two MXU matmuls of the expanded anisotropic
   L2 form), masks invalid ring slots, and reduces the tile to its EXACT
   top-k (k-step iterative max on the VPU). Only [Q, n_tiles, K] candidates
   reach HBM — ~60x smaller than the dense [Q, N] similarity the XLA path
   writes, reads back for top-k, and reads again for the readout.

2. The global top-k is the top-k of the per-tile candidates (any global
   top-k element is, within its own tile, larger than all but k-1 others,
   so it appears among that tile's top-k) — an exact merge, done in XLA on
   the small candidate tensor. Ties resolve to the lowest global index in
   both paths, so the selected set matches jax.lax.top_k exactly.

3. `_readout_kernel` (grid q_tiles x n_tiles): rebuilds each affinity tile
   on the fly in VMEM from the (indices, weights) pairs and feeds the MXU
   directly against the value ring; the usage side-output
   (reference:memory_utils.py:73-74) is an exact [Q, K] -> [N] scatter-add.

The result is bit-comparable to the XLA 'exact' path (same selected set,
same softmax, same f32 accumulation order); parity is asserted in
tests/test_pallas_attention.py.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# kernel 1: similarity tiles + per-tile exact top-k
# --------------------------------------------------------------------------

def _sim_topk_kernel(qe_ref, qkqe_ref, bsq_ref, mk_ref, msv_ref, vmask_ref,
                     vals_ref, idx_ref, *, k: int, n_tile: int):
    """qe/qkqe: [Q_T, Ck]; bsq: [Q_T, 1]; mk: [N_T, Ck]; msv/vmask: [1, N_T]
    (shrinkage/sqrt(Ck) and validity); vals/idx out: [1, Q_T, K] (candidate
    arrays are tile-major [T, Q, K] so the block's trailing dims satisfy the
    Mosaic (8, 128)-divisible-or-full constraint).

    sim = (2*(qk*qe)@mk^T - qe@(mk*mk)^T - sum(qe*qk^2)) * ms/sqrt(Ck)
    (reference:deva/model/memory_utils.py:27-45, tokens-major)."""
    mk = mk_ref[:].astype(jnp.float32)
    # HIGHEST precision to match the XLA path's f32 similarity exactly
    # (DEFAULT decomposes f32 into fewer bf16 MXU passes, which flips
    # near-tie top-k selections vs the reference)
    a_sq = jnp.dot(qe_ref[:], (mk * mk).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    two_ab = 2.0 * jnp.dot(qkqe_ref[:], mk.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    sim = (two_ab - a_sq - bsq_ref[:]) * msv_ref[:]
    sim = jnp.where(vmask_ref[:] > 0, sim, -jnp.inf)

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
    q, ck = qk.shape
    n = mk.shape[0]
    n_tile = n_tile if n >= n_tile else _round_up(max(n, 128), 128)
    q_tile = q_tile if q >= q_tile else _round_up(max(q, 8), 8)
    qp, np_ = _round_up(q, q_tile), _round_up(n, n_tile)

    qk = qk.astype(jnp.float32)
    qe_f = qe.astype(jnp.float32) if qe is not None else jnp.ones_like(qk)
    qkqe = qk * qe_f
    # the qe=None reference form omits the (per-row constant) b^2 term
    # (reference:deva/model/memory_utils.py:40-45); match its values exactly
    bsq = jnp.sum(qe_f * qk * qk, axis=-1, keepdims=True) if qe is not None \
        else jnp.zeros((q, 1), jnp.float32)
    # divide (not multiply-by-reciprocal): bitwise-identical to the XLA
    # path's `sim * (ms / sqrt(ck))` so near-tie rankings match exactly
    msv = (ms.astype(jnp.float32) / math.sqrt(ck)) if ms is not None else \
        jnp.full((n,), 1.0 / math.sqrt(ck), jnp.float32)
    vmask = jnp.ones((n,), jnp.float32) if valid is None else \
        valid.astype(jnp.float32)

    qe_p = jnp.pad(qe_f, ((0, qp - q), (0, 0)))
    qkqe_p = jnp.pad(qkqe, ((0, qp - q), (0, 0)))
    bsq_p = jnp.pad(bsq, ((0, qp - q), (0, 0)))
    mk_p = jnp.pad(mk.astype(jnp.float32), ((0, np_ - n), (0, 0)))
    msv_p = jnp.pad(msv, (0, np_ - n))[None]
    vmask_p = jnp.pad(vmask, (0, np_ - n))[None]

    t = np_ // n_tile
    grid = (qp // q_tile, t)
    kernel = functools.partial(_sim_topk_kernel, k=top_k, n_tile=n_tile)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
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
        ],
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
    )(qe_p, qkqe_p, bsq_p, mk_p, msv_p, vmask_p)

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
# kernel 2: sparse readout (affinity tiles rebuilt in VMEM)
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
# the fused path
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
