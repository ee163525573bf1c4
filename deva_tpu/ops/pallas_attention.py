"""Pallas TPU kernel: top-k attention readout without a dense HBM affinity.

The hot memory readout (SURVEY §2.7: similarity -> top-k softmax -> weighted
readout, reference:deva/model/memory_utils.py:27-94) needs, per query, a
K-sparse row of an [N_mem x Q] affinity matrix multiplied into the value
rings. The XLA path scatters the top-k weights into a dense [Q, N] affinity
in HBM (tens of MB written + read back per frame). This kernel instead
rebuilds each affinity tile on the fly in VMEM from the top-k
(indices, weights) and feeds the MXU directly:

  grid (q_tiles, n_tiles):
    aff_tile[q, n] = sum_k (idx[q, k] == n_base + n) * w[q, k]   (VPU)
    acc[q_tile]   += aff_tile @ value[n_tile]                    (MXU)

Similarity and the (cheap, [Q, K]-shaped) top-k stay in XLA; so does the
usage side-output (a scatter-add of w into [N], reference:memory_utils.py:
73-74).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deva_tpu.ops import memory_attention as ma


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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attend_pallas(mk: jnp.ndarray, ms: Optional[jnp.ndarray],
                  values: jnp.ndarray, qk: jnp.ndarray,
                  qe: Optional[jnp.ndarray], top_k: int,
                  valid: Optional[jnp.ndarray] = None,
                  return_usage: bool = False, *, interpret: bool = False):
    """Drop-in replacement for deva_tpu.ops.memory_attention.attend using the
    Pallas readout. values: [N, O, Cv] token-major. Returns [O, Q, Cv] (f32)
    and optionally the per-token usage [N]."""
    n, o, cv = values.shape
    q = qk.shape[0]
    sim = ma.get_similarity(mk, ms, qk, qe)
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, -jnp.inf)
    vals, idx = jax.lax.top_k(sim, top_k)
    row_max = vals[..., :1]
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    x_exp = jnp.exp(vals - row_max)
    w = x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)

    # pad to tile multiples; padded queries gather token 0 with weight 0,
    # padded tokens are never indexed
    n_tile = 512 if n >= 512 else _round_up(n, 128)
    q_tile = 256 if q >= 256 else _round_up(q, 8)
    qp = _round_up(q, q_tile)
    np_ = _round_up(n, n_tile)
    cp = _round_up(o * cv, 128)
    idx_p = jnp.pad(idx, ((0, qp - q), (0, 0)))
    w_p = jnp.pad(w, ((0, qp - q), (0, 0)))
    v2 = values.reshape(n, o * cv)
    v_p = jnp.pad(v2, ((0, np_ - n), (0, cp - o * cv)))

    out = topk_readout(idx_p, w_p, v_p, q_tile=q_tile, n_tile=n_tile,
                       interpret=interpret)
    out = out[:q, :o * cv].reshape(q, o, cv).transpose(1, 0, 2)
    if return_usage:
        usage = jnp.zeros((n,), jnp.float32).at[idx.reshape(-1)].add(
            w.reshape(-1), mode="drop")
        return out, usage
    return out
