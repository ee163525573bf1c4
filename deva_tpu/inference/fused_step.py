"""Fused per-frame propagation step: one compiled XLA program per frame.

The composed path (InferenceCore._segment + MemoryEngine.match_memory + ...)
dispatches many small device calls per frame; on TPU the dispatch/roundtrip
overhead dominates the (sub-millisecond) kernels. This module fuses the whole
hot path for the common case — propagate a frame with no input mask, a single
working-memory bucket in identity row order, optional long-term ring — into a
single jitted function:

    pad -> encode -> key projection -> masked top-k attention over the rings
    -> decode -> aggregate/upsample -> (optionally) encode mask value and
    append one frame of tokens to the rings, all in one XLA program.

Semantics are identical to the composed path (same sub-functions); the parity
tests exercise both. Static variants are cached per
(mem_write, update_sensory, long-term on/off, usage counting).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops import memory_attention as ma
from deva_tpu.ops.pad import pad_amounts
from deva_tpu.inference.memory import _readout_token_major


class FusedStepper:
    def __init__(self, model: DEVANetwork, top_k: int,
                 use_pallas: bool = False, topk_method: str = "auto",
                 preencode_blocks: bool = False):
        self.model = model
        self.top_k = top_k
        self.use_pallas = use_pallas
        self.topk_method = topk_method
        # True: single-stream blocks batch the K frames' encoders +
        # attention ahead of a decode-only scan (_raw_block_preenc).
        # Measured NEUTRAL at serving shapes (scripts/probe_preenc.py,
        # see InferenceConfig.preencode_blocks), so the parity-exact
        # per-frame body stays the default.
        self.preencode_blocks = preencode_blocks
        self._cache: Dict = {}

    # Below this many ring tokens the XLA threshold-dense path beats the
    # fused Pallas kernels on-chip. Measured per-frame device time (1620
    # queries, 3 objects, bf16 rings, scan-amortized,
    # scripts/probe_components.py on v5e):
    #     tokens   XLA approx-dense   fused-approx
    #     16.9k        2.98 ms           5.37 ms
    #     49.7k        5.76 ms           7.67 ms
    # One materialized [Q, N] similarity costs less than the fused path's
    # three in-VMEM similarity rebuilds; the slopes put the crossover near
    # ~190k tokens — beyond ANY DEVA configuration (work<=T_max*HW + LT
    # <=10k tops out ~26k at defaults). The fused kernels stay available
    # (use_pallas_attention=True forces them; 'exact' still uses the
    # bitwise-parity fused kernel, which beats XLA exact-dense 14 vs 47
    # ms) but the approx serving default is the dense path by measurement.
    PALLAS_MIN_TOKENS = 196608

    def _attend(self, key_ring, shr_ring, value_ring, valid, qk, qe,
                want_usage: bool):
        """Masked top-k attention over one ring. use_pallas is False / True
        (forced) / 'auto'; with 'auto' the impl is picked by the resolved
        topk_method and the MEASURED shape policy above: 'exact' ->
        attend_pallas (reference top-k, bitwise parity); 'approx' (TPU
        serving default) -> XLA threshold-dense below PALLAS_MIN_TOKENS,
        attend_pallas_approx (threshold support ⊇ exact top-k) above."""
        if self.use_pallas:
            from deva_tpu.ops.pallas_attention import (attend_pallas,
                                                       attend_pallas_approx)
            if ma.resolve_topk_method(self.topk_method) == "approx":
                if self.use_pallas is True or \
                        key_ring.shape[0] >= self.PALLAS_MIN_TOKENS:
                    return attend_pallas_approx(key_ring, shr_ring,
                                                value_ring, qk, qe,
                                                self.top_k, valid,
                                                return_usage=want_usage)
            else:
                return attend_pallas(key_ring, shr_ring, value_ring, qk, qe,
                                     self.top_k, valid,
                                     return_usage=want_usage)
        sim = ma.get_similarity(key_ring, shr_ring, qk, qe,
                                precision=ma.similarity_precision(
                                    self.topk_method))
        if want_usage:
            aff, usage = ma.topk_softmax(sim, self.top_k, valid,
                                         return_usage=True,
                                         method=self.topk_method)
            return _readout_token_major(aff, value_ring), usage
        aff = ma.topk_softmax(sim, self.top_k, valid,
                              method=self.topk_method)
        return _readout_token_major(aff, value_ring)

    def _attend_rings(self, qk, qe, key_ring, shr_ring, value_ring, size,
                      lt_key, lt_shr, lt_value, lt_size, use_lt: bool,
                      work_usage: bool):
        """Attention over the rings for any number of query rows (one frame's
        Q, or K frames' K*Q stacked — the rings are loop-invariant within a
        block, so batching frames into the query axis is exact).
        Returns (rd [O, Q, Cv], work_usage_arr | None, lt_usage | None)."""
        cap = key_ring.shape[0]
        if use_lt:
            lcap = lt_key.shape[0]
            lt_valid = jnp.arange(lcap) < lt_size
            work_valid = jnp.arange(cap) < size
            if self.use_pallas and \
                    ma.resolve_topk_method(self.topk_method) == "approx" and \
                    (self.use_pallas is True or
                     lcap + cap >= self.PALLAS_MIN_TOKENS):
                # multi-ring fused kernel (shape policy: see _attend)
                from deva_tpu.ops.pallas_attention import \
                    attend_pallas_approx_multi
                rd, (lt_usage, work_usage_arr) = attend_pallas_approx_multi(
                    [(lt_key, lt_shr, lt_value, lt_valid),
                     (key_ring, shr_ring, value_ring, work_valid)],
                    qk, qe, self.top_k, return_usage=True)
            else:
                valid = jnp.concatenate([lt_valid, work_valid])
                rd, usage = self._attend(
                    jnp.concatenate([lt_key, key_ring], 0),
                    jnp.concatenate([lt_shr, shr_ring], 0),
                    jnp.concatenate([lt_value, value_ring], 0),
                    valid, qk, qe, want_usage=True)
                lt_usage, work_usage_arr = usage[:lcap], usage[lcap:]
            return rd, work_usage_arr, lt_usage
        valid = jnp.arange(cap) < size
        if work_usage:
            rd, work_usage_arr = self._attend(key_ring, shr_ring, value_ring,
                                              valid, qk, qe, want_usage=True)
            return rd, work_usage_arr, None
        rd = self._attend(key_ring, shr_ring, value_ring, valid, qk, qe,
                          want_usage=False)
        return rd, None, None

    def _raw_step(self, mem_write: bool, update_sensory: bool, use_lt: bool,
                  work_usage: bool, count_lt_usage: bool,
                  slice_channels: bool = True):
        """The traceable single-frame body (jitted directly by _build;
        composed K times by _build_unrolled; vmapped over videos by the
        batched propagator with slice_channels=False so num_obj can be a
        per-video traced scalar)."""
        model = self.model
        top_k = self.top_k

        def fn(variables, image, pads, num_obj,
               key_ring, shr_ring, sel_ring, value_ring, use_cnt, life_cnt,
               size, lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
               sensory, last_mask):
            # image [H, W, 3] unpadded; pads static (lw, uw, lh, uh)
            lw, uw, lh, uh = pads
            padded = jnp.pad(image, ((lh, uh), (lw, uw), (0, 0)))[None]
            ms, key_feat = model.apply(variables, padded,
                                       method=DEVANetwork.encode_image)
            key, shrinkage, selection = model.apply(
                variables, key_feat, method=DEVANetwork.transform_key)
            b, hq, wq, ck = key.shape
            qk = key[0].reshape(hq * wq, ck)
            qe = selection[0].reshape(hq * wq, ck)

            cap = key_ring.shape[0]
            rd, work_usage_arr, lt_usage = self._attend_rings(
                qk, qe, key_ring, shr_ring, value_ring, size,
                lt_key, lt_shr, lt_value, lt_size, use_lt, work_usage)

            if work_usage:
                valid_w = jnp.arange(cap) < size
                use_cnt = use_cnt + jnp.where(valid_w, work_usage_arr, 0.0)
                life_cnt = life_cnt + jnp.where(valid_w, 1.0, 0.0)
            if use_lt and count_lt_usage:
                valid_l = jnp.arange(lt_key.shape[0]) < lt_size
                lt_use = lt_use + jnp.where(valid_l, lt_usage, 0.0)
                lt_life = lt_life + jnp.where(valid_l, 1.0, 0.0)

            o_cap = sensory.shape[0]
            readout = rd.reshape(1, o_cap, hq, wq, -1)
            selector = (jnp.arange(o_cap) < num_obj).astype(jnp.float32)[None]
            new_sensory, _, prob = model.apply(
                variables, ms, readout, sensory[None], last_mask[None],
                selector=selector, update_sensory=update_sensory,
                method=DEVANetwork.segment)
            new_sensory = new_sensory[0] if update_sensory else sensory
            new_last_mask = prob[0, 1:]

            if mem_write:
                value, deep_sensory = model.apply(
                    variables, padded, ms[0], new_sensory[None],
                    new_last_mask[None], deep_update=True,
                    method=DEVANetwork.encode_mask)
                new_sensory = deep_sensory[0]
                new_key = key[0].reshape(hq * wq, ck)
                new_shr = shrinkage[0].reshape(hq * wq)
                new_sel = qe if sel_ring is not None else None
                vals = value[0].reshape(o_cap, hq * wq, -1).transpose(1, 0, 2)
                key_ring = jax.lax.dynamic_update_slice(
                    key_ring, new_key.astype(key_ring.dtype), (size, 0))
                shr_ring = jax.lax.dynamic_update_slice(
                    shr_ring, new_shr.astype(shr_ring.dtype), (size,))
                if sel_ring is not None:
                    sel_ring = jax.lax.dynamic_update_slice(
                        sel_ring, new_sel.astype(sel_ring.dtype), (size, 0))
                value_ring = jax.lax.dynamic_update_slice(
                    value_ring, vals.astype(value_ring.dtype), (size, 0, 0))
                if use_cnt is not None:
                    zeros = jnp.zeros((hq * wq,), use_cnt.dtype)
                    use_cnt = jax.lax.dynamic_update_slice(
                        use_cnt, zeros, (size,))
                    life_cnt = jax.lax.dynamic_update_slice(
                        life_cnt, zeros + 1e-7, (size,))

            # unpad + slice to the live channels (all static -> the caller
            # gets exactly [1 + num_obj, H, W] in the same single launch)
            h, w = image.shape[:2]
            if slice_channels:
                prob_out = prob[0, :num_obj + 1, lh:lh + h, lw:lw + w]
            else:
                prob_out = prob[0, :, lh:lh + h, lw:lw + w]
            return (prob_out, new_sensory, new_last_mask, key_ring, shr_ring,
                    sel_ring, value_ring, use_cnt, life_cnt, lt_use, lt_life)

        return fn

    def _build(self, mem_write: bool, update_sensory: bool, use_lt: bool,
               work_usage: bool, count_lt_usage: bool):
        fn = self._raw_step(mem_write, update_sensory, use_lt, work_usage,
                            count_lt_usage)
        # donate the rewritten rings on write frames plus the per-frame
        # sensory/last_mask state (args 17, 18) so updates happen in place
        donate = (4, 5, 6, 7, 8, 9, 17, 18) if mem_write else (17, 18)
        return jax.jit(fn, static_argnums=(2, 3),
                       donate_argnums=donate)

    # -- multi-frame blocks ---------------------------------------------------

    def _build_block(self, n_read: int, write_last: bool, use_lt: bool,
                     work_usage: bool, count_lt_usage: bool,
                     slice_channels: bool = True, preencode: bool = False):
        """(n_read + write_last) frames in ONE compiled launch: n_read
        read-only propagate frames via lax.scan — the rings are
        loop-invariant, so the carry is only (sensory, last_mask [, usage
        counters]) — then optionally one memory-write frame. Matches the
        natural mem_every cadence (a block per memory period); compile cost
        ~2 single frames regardless of n_read, and the per-launch relay
        round-trip (~30 ms on the tunneled chip, the dominant cost at batch
        1x1) is amortized over the whole block.

        preencode=True uses the restructured body (_raw_block_preenc): all K
        frames' encoders and the ring attention run batched before a
        decode-only scan — the single-stream default (see run_block)."""
        if preencode:
            fn = self._raw_block_preenc(n_read, write_last, use_lt,
                                        work_usage, count_lt_usage,
                                        slice_channels)
        else:
            fn = self._raw_block(n_read, write_last, use_lt, work_usage,
                                 count_lt_usage, slice_channels)
        donate = (4, 5, 6, 7, 8, 9, 17, 18) if write_last else (17, 18)
        return jax.jit(fn, static_argnums=(2, 3), donate_argnums=donate)

    def _raw_block(self, n_read: int, write_last: bool, use_lt: bool,
                   work_usage: bool, count_lt_usage: bool,
                   slice_channels: bool = True):
        """Traceable block body (jitted by _build_block; vmapped over videos
        by the batched propagator with slice_channels=False)."""
        read = self._raw_step(False, True, use_lt, work_usage,
                              count_lt_usage, slice_channels=False)
        write = self._raw_step(True, True, use_lt, work_usage,
                               count_lt_usage, slice_channels=False)

        def fn(variables, frames, pads, num_obj,
               key_ring, shr_ring, sel_ring, value_ring, use_cnt, life_cnt,
               size, lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
               sensory, last_mask):
            def body(carry, frame):
                sensory, last_mask, use_cnt, life_cnt, lt_use, lt_life = carry
                (prob, sensory, last_mask, _k, _s, _sel, _v, use_cnt,
                 life_cnt, lt_use, lt_life) = read(
                    variables, frame, pads, num_obj, key_ring, shr_ring,
                    sel_ring, value_ring, use_cnt, life_cnt, size,
                    lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
                    sensory, last_mask)
                carry = (sensory, last_mask, use_cnt, life_cnt, lt_use,
                         lt_life)
                return carry, prob

            carry = (sensory, last_mask, use_cnt, life_cnt, lt_use, lt_life)
            if n_read > 0:
                carry, probs = jax.lax.scan(body, carry,
                                            frames[:n_read])
            else:
                probs = None
            (sensory, last_mask, use_cnt, life_cnt, lt_use, lt_life) = carry

            if write_last:
                (prob_w, sensory, last_mask, key_ring, shr_ring, sel_ring,
                 value_ring, use_cnt, life_cnt, lt_use, lt_life) = write(
                    variables, frames[n_read], pads, num_obj, key_ring,
                    shr_ring, sel_ring, value_ring, use_cnt, life_cnt, size,
                    lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
                    sensory, last_mask)
                probs = prob_w[None] if probs is None else \
                    jnp.concatenate([probs, prob_w[None]], 0)
            if slice_channels:
                probs = probs[:, :num_obj + 1]
            return (probs, sensory, last_mask, key_ring, shr_ring, sel_ring,
                    value_ring, use_cnt, life_cnt, lt_use, lt_life)

        return fn

    def _raw_block_preenc(self, n_read: int, write_last: bool, use_lt: bool,
                          work_usage: bool, count_lt_usage: bool,
                          slice_channels: bool = True):
        """Restructured block body: the recurrence only flows through the
        decoder (sensory GRU + last mask), so everything else is batched
        across the block's frames —

          1. ONE conv batch encodes all K frames (the ResNet50 encoder is
             ~5% MXU-utilized at b=1; batching frames is the TPU-idiomatic
             fix, impossible in the reference's strictly per-frame loop,
             reference:deva/inference/inference_core.py:200),
          2. ONE masked top-k attention with K*Q query rows (the rings are
             loop-invariant within a block, so this is exact; usage counters
             are per-token sums over queries, order-independent),
          3. a decode-only lax.scan carrying (sensory, last_mask),
          4. optionally one memory-write frame reusing its precomputed
             key/selection/f16 features.

        Same signature/outputs as _raw_block; parity is pinned by the
        step_chunk tests (single-stream run_block uses this body)."""
        model = self.model
        k_total = n_read + (1 if write_last else 0)

        def fn(variables, frames, pads, num_obj,
               key_ring, shr_ring, sel_ring, value_ring, use_cnt, life_cnt,
               size, lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
               sensory, last_mask):
            lw, uw, lh, uh = pads
            padded = jnp.pad(frames[:k_total],
                             ((0, 0), (lh, uh), (lw, uw), (0, 0)))
            ms, key_feat = model.apply(variables, padded,
                                       method=DEVANetwork.encode_image)
            key, shrinkage, selection = model.apply(
                variables, key_feat, method=DEVANetwork.transform_key)
            kk, hq, wq, ck = key.shape
            q = hq * wq
            qk_all = key.reshape(kk * q, ck)
            qe_all = selection.reshape(kk * q, ck)

            rd, work_usage_arr, lt_usage = self._attend_rings(
                qk_all, qe_all, key_ring, shr_ring, value_ring, size,
                lt_key, lt_shr, lt_value, lt_size, use_lt, work_usage)
            cap = key_ring.shape[0]
            if work_usage:
                valid_w = jnp.arange(cap) < size
                use_cnt = use_cnt + jnp.where(valid_w, work_usage_arr, 0.0)
                life_cnt = life_cnt + jnp.where(valid_w, float(k_total), 0.0)
            if use_lt and count_lt_usage:
                valid_l = jnp.arange(lt_key.shape[0]) < lt_size
                lt_use = lt_use + jnp.where(valid_l, lt_usage, 0.0)
                lt_life = lt_life + jnp.where(valid_l, float(k_total), 0.0)

            o_cap = sensory.shape[0]
            cv = rd.shape[-1]
            # rd [O, K*Q, Cv] (query rows frame-major) -> per-frame readouts
            readouts = rd.reshape(o_cap, kk, q, cv).transpose(1, 0, 2, 3) \
                         .reshape(kk, 1, o_cap, hq, wq, cv)
            selector = (jnp.arange(o_cap) < num_obj).astype(jnp.float32)[None]

            def decode(ms_i, readout_i, sensory, last_mask):
                new_sensory, _, prob = model.apply(
                    variables, ms_i, readout_i, sensory[None],
                    last_mask[None], selector=selector, update_sensory=True,
                    method=DEVANetwork.segment)
                return new_sensory[0], prob[0]

            def body(carry, inp):
                sensory, last_mask = carry
                ms_i, readout_i = inp
                new_sensory, prob = decode(ms_i, readout_i, sensory,
                                           last_mask)
                return (new_sensory, prob[1:]), prob

            if n_read > 0:
                ms_scan = jax.tree_util.tree_map(
                    lambda x: x[:n_read, None], ms)
                (sensory, last_mask), probs = jax.lax.scan(
                    body, (sensory, last_mask),
                    (ms_scan, readouts[:n_read]))
            else:
                probs = None

            if write_last:
                ms_w = jax.tree_util.tree_map(
                    lambda x: x[n_read][None], ms)
                sensory, prob_w = decode(ms_w, readouts[n_read], sensory,
                                         last_mask)
                last_mask = prob_w[1:]
                value, deep_sensory = model.apply(
                    variables, padded[n_read][None], ms[0][n_read][None],
                    sensory[None], last_mask[None], deep_update=True,
                    method=DEVANetwork.encode_mask)
                sensory = deep_sensory[0]
                new_key = key[n_read].reshape(q, ck)
                new_shr = shrinkage[n_read].reshape(q)
                vals = value[0].reshape(o_cap, q, -1).transpose(1, 0, 2)
                key_ring = jax.lax.dynamic_update_slice(
                    key_ring, new_key.astype(key_ring.dtype), (size, 0))
                shr_ring = jax.lax.dynamic_update_slice(
                    shr_ring, new_shr.astype(shr_ring.dtype), (size,))
                if sel_ring is not None:
                    new_sel = selection[n_read].reshape(q, ck)
                    sel_ring = jax.lax.dynamic_update_slice(
                        sel_ring, new_sel.astype(sel_ring.dtype), (size, 0))
                value_ring = jax.lax.dynamic_update_slice(
                    value_ring, vals.astype(value_ring.dtype), (size, 0, 0))
                if use_cnt is not None:
                    zeros = jnp.zeros((q,), use_cnt.dtype)
                    use_cnt = jax.lax.dynamic_update_slice(
                        use_cnt, zeros, (size,))
                    life_cnt = jax.lax.dynamic_update_slice(
                        life_cnt, zeros + 1e-7, (size,))
                probs = prob_w[None] if probs is None else \
                    jnp.concatenate([probs, prob_w[None]], 0)

            h, w = frames.shape[1:3]
            probs = probs[:, :, lh:lh + h, lw:lw + w]
            if slice_channels:
                probs = probs[:, :num_obj + 1]
            return (probs, sensory, last_mask, key_ring, shr_ring, sel_ring,
                    value_ring, use_cnt, life_cnt, lt_use, lt_life)

        return fn

    def run_block(self, variables, frames, num_obj, bucket, lt,
                  sensory, last_mask, *, write_last: bool,
                  work_usage: bool, count_lt_usage: bool):
        """frames: [K, H, W, 3] device array; the first K-1 (or K if not
        write_last) frames are read-only, the last one writes memory.
        Updates bucket/lt in place; returns (probs [K, 1+num_obj, H, W],
        sensory, last_mask)."""
        use_lt = lt is not None and lt.size > 0
        k, h, w = frames.shape[:3]
        n_read = k - 1 if write_last else k
        pads = pad_amounts(h, w, 16)
        cache_key = ("block", n_read, write_last, use_lt, work_usage,
                     count_lt_usage and use_lt, self.preencode_blocks)
        if cache_key not in self._cache:
            self._cache[cache_key] = self._build_block(
                n_read, write_last, use_lt, work_usage,
                count_lt_usage and use_lt,
                preencode=self.preencode_blocks)
        fn = self._cache[cache_key]

        if use_lt:
            lt_args = (lt.key, lt.shrinkage, lt.value, lt.use_cnt,
                       lt.life_cnt, lt.size)
        else:
            lt_args = (jnp.zeros((0, bucket.key.shape[1])), jnp.zeros((0,)),
                       jnp.zeros((0, *bucket.value.shape[1:])), None, None, 0)

        (probs, new_sensory, new_last_mask, key_ring, shr_ring, sel_ring,
         value_ring, use_cnt, life_cnt, lt_use, lt_life) = fn(
            variables, frames, pads, int(num_obj),
            bucket.key, bucket.shrinkage, bucket.selection, bucket.value,
            bucket.use_cnt, bucket.life_cnt, bucket.size, *lt_args,
            sensory, last_mask)

        if write_last:
            bucket.key, bucket.shrinkage = key_ring, shr_ring
            bucket.selection, bucket.value = sel_ring, value_ring
            lw, uw, lh, uh = pads
            bucket.size += ((h + lh + uh) // 16) * ((w + lw + uw) // 16)
        if work_usage:
            bucket.use_cnt, bucket.life_cnt = use_cnt, life_cnt
        if use_lt and count_lt_usage:
            lt.use_cnt, lt.life_cnt = lt_use, lt_life
        return probs, new_sensory, new_last_mask

    def run_chunk(self, variables, frames, writes, num_obj, bucket, lt,
                  sensory, last_mask, *, work_usage: bool,
                  count_lt_usage: bool):
        """frames: [K, H, W, 3] device array; writes: [K] bool. Decomposes
        the chunk into memory-period blocks — a run of read-only frames plus
        at most one trailing write frame — and runs each as ONE compiled
        launch of the block body (run_block: lax.scan with loop-invariant
        rings, so no ring carry copies). Updates bucket/lt in place, returns
        (probs [K, 1 + num_obj, H, W], sensory, last_mask)."""
        import numpy as _np
        writes_np = _np.asarray(writes, bool)
        k = len(writes_np)
        assert frames.shape[0] == k
        probs_parts = []
        start = 0
        while start < k:
            later_writes = _np.nonzero(writes_np[start:])[0]
            if len(later_writes) == 0:
                stop, write_last = k, False
            else:
                stop, write_last = start + int(later_writes[0]) + 1, True
            p, sensory, last_mask = self.run_block(
                variables, frames[start:stop], num_obj, bucket, lt,
                sensory, last_mask, write_last=write_last,
                work_usage=work_usage, count_lt_usage=count_lt_usage)
            probs_parts.append(p)
            start = stop
        probs = probs_parts[0] if len(probs_parts) == 1 else \
            jnp.concatenate(probs_parts, 0)
        return probs, sensory, last_mask

    def __call__(self, variables, image, num_obj, bucket, lt,
                 sensory, last_mask, *, mem_write: bool, update_sensory: bool,
                 work_usage: bool, count_lt_usage: bool):
        """Runs the fused step and writes results back into bucket/lt.
        Returns (prob [1+O_cap, H, W], new_sensory, new_last_mask)."""
        use_lt = lt is not None and lt.size > 0
        h, w = image.shape[:2]
        pads = pad_amounts(h, w, 16)
        cache_key = (mem_write, update_sensory, use_lt, work_usage,
                     count_lt_usage and use_lt)
        if cache_key not in self._cache:
            self._cache[cache_key] = self._build(
                mem_write, update_sensory, use_lt, work_usage,
                count_lt_usage and use_lt)
        fn = self._cache[cache_key]

        if use_lt:
            lt_args = (lt.key, lt.shrinkage, lt.value, lt.use_cnt,
                       lt.life_cnt, lt.size)
        else:
            z = jnp.zeros((0,))
            lt_args = (jnp.zeros((0, bucket.key.shape[1])), z,
                       jnp.zeros((0, *bucket.value.shape[1:])), None, None, 0)

        (prob, new_sensory, new_last_mask, key_ring, shr_ring, sel_ring,
         value_ring, use_cnt, life_cnt, lt_use, lt_life) = fn(
            variables, image, pads, int(num_obj),
            bucket.key, bucket.shrinkage, bucket.selection, bucket.value,
            bucket.use_cnt, bucket.life_cnt, bucket.size, *lt_args,
            sensory, last_mask)

        if mem_write:
            bucket.key, bucket.shrinkage = key_ring, shr_ring
            bucket.selection, bucket.value = sel_ring, value_ring
            lw, uw, lh, uh = pads
            bucket.size += ((h + lh + uh) // 16) * ((w + lw + uw) // 16)
        if work_usage:
            bucket.use_cnt, bucket.life_cnt = use_cnt, life_cnt
        if use_lt and count_lt_usage:
            lt.use_cnt, lt.life_cnt = lt_use, lt_life
        return prob, new_sensory, new_last_mask
