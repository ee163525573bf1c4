"""Lockstep multi-video stepping for the detection-fusion pipeline.

The reference's detection-driven eval is strictly single-stream
(reference:evaluation/eval_with_detections.py:205-265): per video, the
semi-online machine buffers frames, votes a consensus, incorporates the
detection, then propagates. The model-heavy parts of that loop — the plain
propagation frames and the forward prediction `_segment` inside
`incorporate_detection` (reference:deva/inference/inference_core.py:137-198)
— have no cross-video coupling, so on TPU they batch across videos into one
vmapped launch; only consensus/ILP/match-and-merge (host work + per-video
model calls at a 1-in-detection_every cadence) stay sequential.

Unlike the VOS-style BatchedPropagator (one bucket per video), detection
videos hold MULTI-BUCKET memory: objects first seen at different detections
share separate top-k normalization sets (reference:deva/inference/
kv_memory_store.py:10-33). Here each video's buckets are stacked into
fixed-shape SLOT arrays [S, cap, ...] (S = padded bucket count); the
vmapped per-frame body attends each slot against the shared queries with
its own validity window and scatters per-slot readout rows into the global
object rows — identical math to MemoryEngine.match_memory, batched.

Scope: long-term memory OFF (the eval driver falls back to the sequential
path for videos that enable it — same scoping as eval_vos_batched's
mid-stream-mask fallback). State is attached from / detached to ordinary
per-video InferenceCores, so the detection steps (consensus, incorporate)
run the reference-parity single-video code in between.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.memory import _round_up
from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops.pad import pad_amounts


def _slot_bucket(n: int) -> int:
    for b in (1, 2, 4, 8, 16, 32):
        if n <= b:
            return b
    return n


class BatchedDetectionPropagator:
    def __init__(self, model: DEVANetwork, variables,
                 config: InferenceConfig):
        assert not config.enable_long_term, (
            "batched detection stepping is scoped to long-term OFF; route "
            "LT videos through the sequential path")
        self.model = model
        self.variables = variables
        self.cfg = config
        self._fns: Dict = {}

    # -- stacking ----------------------------------------------------------

    def attach(self, cores: Sequence[InferenceCore]) -> None:
        """Stack the cores' multi-bucket state. Every core must be engaged
        (first detection incorporated) and share one padded resolution."""
        self.cores = list(cores)
        b = len(cores)
        assert b > 0
        for c in cores:
            assert c.memory is not None and c.memory.engaged
            assert not c.memory.long_buckets
        self.o_cap = max(c.o_cap for c in cores)
        n_slots = _slot_bucket(max(len(c.memory.buckets) for c in cores))
        self.n_slots = n_slots
        self.o_slot = max(bk.o_cap for c in cores
                          for bk in c.memory.buckets.values())
        cap = max(bk.cap for c in cores for bk in c.memory.buckets.values())
        self.hw = cores[0].memory.hw
        cap = _round_up(cap, self.hw)
        ck, cv = cores[0].memory.ck, cores[0].memory.cv
        dt = list(cores[0].memory.buckets.values())[0].key.dtype

        keys = np.zeros((b, n_slots), object)
        self.sizes = np.zeros((b, n_slots), np.int64)
        self.rowcnt = np.zeros((b, n_slots), np.int64)
        rowmaps = np.zeros((b, n_slots, self.o_slot), np.int64)
        key_l, shr_l, val_l, sen_l, lm_l, nobj = [], [], [], [], [], []
        self._slot_bids: List[List[int]] = []
        for vi, c in enumerate(cores):
            obj_rows = {o.id: t - 1
                        for o, t in c.object_manager.obj_to_tmp_id.items()}
            ks = jnp.zeros((n_slots, cap, ck), dt)
            ss = jnp.zeros((n_slots, cap), dt)
            vs = jnp.zeros((n_slots, cap, self.o_slot, cv), dt)
            bids = sorted(c.memory.buckets.keys())
            self._slot_bids.append(bids)
            for si, bid in enumerate(bids):
                bk = c.memory.buckets[bid]
                ks = ks.at[si, :bk.cap].set(bk.key)
                ss = ss.at[si, :bk.cap].set(bk.shrinkage)
                vs = vs.at[si, :bk.cap, :bk.o_cap].set(bk.value)
                self.sizes[vi, si] = bk.size
                self.rowcnt[vi, si] = len(bk.obj_ids)
                rowmaps[vi, si, :len(bk.obj_ids)] = [obj_rows[o]
                                                     for o in bk.obj_ids]
            key_l.append(ks)
            shr_l.append(ss)
            val_l.append(vs)
            pad_o = self.o_cap - c.memory.sensory.shape[0]
            sen_l.append(jnp.pad(c.memory.sensory,
                                 ((0, pad_o), (0, 0), (0, 0), (0, 0))))
            lm_l.append(jnp.pad(c.last_mask,
                                ((0, self.o_cap - c.last_mask.shape[0]),
                                 (0, 0), (0, 0))))
            nobj.append(c.object_manager.num_obj)
        self.key = jnp.stack(key_l)
        self.shr = jnp.stack(shr_l)
        self.value = jnp.stack(val_l)
        self.sensory = jnp.stack(sen_l)
        self.last_mask = jnp.stack(lm_l)
        self.num_obj = jnp.asarray(nobj, jnp.int32)
        self.rowmaps = jnp.asarray(rowmaps, jnp.int32)
        # per-video frame clocks: videos may join the batch at different
        # times and reset their memory cadence independently (a mid-stream
        # mask forces a write and resets last_mem_ti,
        # reference:deva/inference/inference_core.py:232-234), so neither
        # clock is required to be uniform across the batch
        self.curr_ti = np.asarray([c.curr_ti for c in cores], np.int64)
        self.last_mem_ti = np.asarray([c.last_mem_ti for c in cores],
                                      np.int64)

    def detach(self) -> None:
        """Write the advanced stacked state back into the per-video cores
        (so consensus/incorporate run reference-parity single-video code)."""
        def fit(a, cap):
            # stacked cap and the bucket's own cap may differ either way
            if a.shape[0] >= cap:
                return a[:cap]
            pad = [(0, cap - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad)

        for vi, c in enumerate(self.cores):
            for si, bid in enumerate(self._slot_bids[vi]):
                bk = c.memory.buckets[bid]
                need = int(self.sizes[vi, si])
                if need > bk.cap:
                    bk.ensure_capacity(need - bk.size, self.hw)
                bk.key = fit(self.key[vi, si], bk.cap)
                bk.shrinkage = fit(self.shr[vi, si], bk.cap)
                bk.value = fit(self.value[vi, si, :, :bk.o_cap], bk.cap)
                bk.size = need
            c.memory.update_sensory(self.sensory[vi, :c.o_cap])
            c.last_mask = self.last_mask[vi, :c.o_cap]
            c.curr_ti = int(self.curr_ti[vi])
            c.last_mem_ti = int(self.last_mem_ti[vi])

    # -- the vmapped body --------------------------------------------------

    def _body(self, n_slots: int, mem_write: bool, update_sensory: bool,
              pads, masked_write: bool = False):
        """masked_write: compile the write path but gate its effects by a
        per-video `do_write` scalar — used when the batch's memory-write
        schedules have diverged (mid-stream mask insertions reset each
        video's cadence). Non-writers still execute the token write at
        their cursor (the tokens land beyond `size`, are masked invalid by
        every reader, and are overwritten by the next real write) but keep
        their shallow sensory: only `size`/`last_mem_ti` advancement (host
        side) and the deep-vs-shallow sensory select depend on the flag."""
        model = self.model
        cfg = self.cfg
        from deva_tpu.inference.fused_step import FusedStepper
        if not hasattr(self, "_stepper"):
            self._stepper = FusedStepper(model, cfg.top_k,
                                         use_pallas=cfg.resolve_use_pallas(),
                                         topk_method=cfg.topk_method)
        stepper = self._stepper
        if masked_write:
            assert mem_write and update_sensory, \
                "masked writes only arise on non-end frames with a writer"

        def fn(image, do_write, num_obj, keys, shrs, values, sizes, rowmaps,
               rowcnt, sensory, last_mask, variables):
            lw, uw, lh, uh = pads
            padded = jnp.pad(image, ((lh, uh), (lw, uw), (0, 0)))[None]
            ms, key_feat = model.apply(variables, padded,
                                       method=DEVANetwork.encode_image)
            key, shrinkage, selection = model.apply(
                variables, key_feat, method=DEVANetwork.transform_key)
            _, hq, wq, ck = key.shape
            qk = key[0].reshape(hq * wq, ck)
            qe = selection[0].reshape(hq * wq, ck)

            cap = keys.shape[1]
            o_cap = sensory.shape[0]
            out = jnp.zeros((o_cap, hq * wq, values.shape[-1]), jnp.float32)
            for s in range(n_slots):
                # empty slots attend over a 1-token window (no NaNs) and
                # scatter zero rows
                valid = jnp.arange(cap) < jnp.maximum(sizes[s], 1)
                rd = stepper._attend(keys[s], shrs[s], values[s], valid,
                                     qk, qe, want_usage=False)
                rmask = (jnp.arange(values.shape[2]) < rowcnt[s])
                rd = jnp.where(rmask[:, None, None],
                               rd.astype(jnp.float32), 0.0)
                out = out.at[rowmaps[s]].add(rd, mode="drop")

            readout = out.reshape(1, o_cap, hq, wq, -1)
            selector = (jnp.arange(o_cap) < num_obj
                        ).astype(jnp.float32)[None]
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
                if masked_write:
                    # non-writers keep the shallow (post-segment) sensory —
                    # the reference only deep-updates on memory frames
                    new_sensory = jnp.where(do_write, deep_sensory[0],
                                            new_sensory)
                else:
                    new_sensory = deep_sensory[0]
                new_key = key[0].reshape(hq * wq, ck)
                new_shr = shrinkage[0].reshape(hq * wq)
                vals_g = value[0].reshape(o_cap, hq * wq, -1)
                for s in range(n_slots):
                    rmask = (jnp.arange(values.shape[2]) < rowcnt[s])
                    vals = jnp.where(rmask[:, None, None],
                                     vals_g[rowmaps[s]], 0.0)
                    vals = vals.transpose(1, 0, 2)  # [HW, o_slot, Cv]
                    keys = keys.at[s].set(jax.lax.dynamic_update_slice(
                        keys[s], new_key.astype(keys.dtype), (sizes[s], 0)))
                    shrs = shrs.at[s].set(jax.lax.dynamic_update_slice(
                        shrs[s], new_shr.astype(shrs.dtype), (sizes[s],)))
                    values = values.at[s].set(jax.lax.dynamic_update_slice(
                        values[s], vals.astype(values.dtype),
                        (sizes[s], 0, 0)))

            h, w = image.shape[:2]
            prob_out = prob[0, :, lh:lh + h, lw:lw + w]
            return (prob_out, new_sensory, new_last_mask, keys, shrs, values)

        return fn

    def _fn(self, mem_write: bool, update_sensory: bool, pads,
            donate: bool = True, masked_write: bool = False):
        keyk = (self.n_slots, mem_write, update_sensory, pads, donate,
                masked_write)
        if keyk not in self._fns:
            body = self._body(self.n_slots, mem_write, update_sensory, pads,
                              masked_write)
            axes = (0,) * 11 + (None,)
            dn = ((9, 10) + ((3, 4, 5) if mem_write else ())) if donate \
                else ()
            self._fns[keyk] = jax.jit(
                jax.vmap(body, in_axes=axes),
                donate_argnums=tuple(sorted(dn)))
        return self._fns[keyk]

    # -- stepping ----------------------------------------------------------

    def _reserve(self, extra: int) -> None:
        need = int(self.sizes.max()) + extra
        cap = self.key.shape[2]
        if need > cap:
            grow = _round_up(need, self.hw) - cap
            self.key = jnp.pad(self.key, ((0, 0), (0, 0), (0, grow), (0, 0)))
            self.shr = jnp.pad(self.shr, ((0, 0), (0, 0), (0, grow)))
            self.value = jnp.pad(self.value,
                                 ((0, 0), (0, 0), (0, grow), (0, 0), (0, 0)))

    def _launch(self, frames, mem_write: bool, update_sensory: bool,
                keep_last_mask: bool = True, donate: bool = True,
                write_mask=None):
        """write_mask: None (uniform launch — every video follows
        `mem_write`) or a [B] bool array of per-video writers (diverged
        cadences); only writers advance their sizes."""
        frames = jnp.stack([jnp.asarray(f, jnp.float32) for f in frames])
        h, w = frames.shape[1:3]
        pads = pad_amounts(h, w, 16)
        hw = ((h + pads[2] + pads[3]) // 16) * ((w + pads[0] + pads[1]) // 16)
        masked = write_mask is not None
        if mem_write:
            self._reserve(hw)
        do_write = jnp.ones((frames.shape[0],), bool) if not masked \
            else jnp.asarray(write_mask)
        fn = self._fn(mem_write, update_sensory, pads, donate, masked)
        out = fn(frames, do_write, self.num_obj, self.key, self.shr,
                 self.value, jnp.asarray(self.sizes), self.rowmaps,
                 jnp.asarray(self.rowcnt), self.sensory, self.last_mask,
                 self.variables)
        probs, self.sensory, last_mask, key, shr, value = out
        if keep_last_mask:
            self.last_mask = last_mask
        if mem_write:
            self.key, self.shr, self.value = key, shr, value
            # every REAL slot of every writing video received one frame
            writers = np.ones((len(self.cores),), bool) if not masked \
                else np.asarray(write_mask)
            self.sizes = self.sizes + hw * (writers[:, None] &
                                            (self.rowcnt > 0))
        return probs

    def step_all(self, frames, end: bool = False) -> jnp.ndarray:
        """One lockstep propagation frame for every video; same semantics as
        per-video core.step(image, None, None, end=end). Videos whose memory
        cadences have diverged (different last_mem_ti) write independently
        via a masked launch. Returns probabilities [B, 1 + o_cap, H, W]
        (live channels first)."""
        self.curr_ti = self.curr_ti + 1
        is_mem = ((self.curr_ti - self.last_mem_ti >= self.cfg.mem_every)
                  & (not end))
        if is_mem.all() or not is_mem.any():
            probs = self._launch(frames, bool(is_mem.all()), not end)
        else:
            probs = self._launch(frames, True, not end,
                                 write_mask=is_mem)
        self.last_mem_ti = np.where(is_mem, self.curr_ti, self.last_mem_ti)
        return probs

    def forward_probs(self, frames) -> np.ndarray:
        """Batched forward prediction for incorporate_detection: the same
        `_segment` every core would run (reference:inference_core.py:166-167)
        in ONE launch. Sensory updates (like the reference's default
        _segment) but last_mask and the frame clock do not advance; feed the
        result as `forward_mask` so incorporate skips its per-video
        segment."""
        probs = self._launch(frames, mem_write=False, update_sensory=True,
                             keep_last_mask=False, donate=False)
        return np.asarray(probs)
