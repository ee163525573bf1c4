"""Batched multi-video propagation: N videos advance in lockstep through ONE
vmapped compiled step per frame.

The reference is strictly single-stream (one video per GPU,
reference:evaluation/eval_vos.py); on TPU the fused step underutilizes the
MXU at batch 1, so propagating a batch of videos per launch multiplies
throughput. State for every video lives in stacked fixed-shape rings
([B, cap, ...]) with per-video size/num_obj scalars; the per-frame body is
the same `_raw_step` the single-video path uses (vmapped with
slice_channels=False so num_obj stays a traced per-video scalar) — the
equivalence test checks batched == sequential.

Scope (v1): VOS-style propagation — one bucket per video created from the
first-frame mask, no long-term memory (short clips; enable_long_term=False),
shared memory-write schedule (same mem_every for all videos). Videos shorter
than the batch keep stepping harmlessly; callers ignore their outputs past
the end.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops.pad import pad_amounts


class BatchedPropagator:
    def __init__(self, model: DEVANetwork, variables,
                 config: InferenceConfig):
        assert not config.enable_long_term, \
            "batched mode v1 covers enable_long_term=False (short clips)"
        self.model = model
        self.variables = variables
        self.cfg = config
        self._fns: Dict = {}
        self._state = None

    def initialize(self, images0: Sequence[np.ndarray],
                   masks0: Sequence[np.ndarray],
                   objects: Sequence[List[int]]):
        """Consume each video's first frame + ground-truth mask through the
        (single-video) reference path, then stack the resulting states."""
        self.cores = []
        o_cap = 0
        for img, mask, objs in zip(images0, masks0, objects):
            core = InferenceCore(self.model, self.variables, self.cfg)
            core.step(img, mask, objects=list(objs))
            (_, bucket), = core.memory.buckets.items()
            o_cap = max(o_cap, bucket.o_cap)
            self.cores.append(core)
        # _stack pads every video's rings/slots to the shared o_cap/cap
        self._stack(o_cap)
        self._token_hw = int(self.sizes[0])  # tokens written per frame
        self.frame_idx = 0  # frames consumed after the first

    def _stack(self, o_cap: int):
        keys, shrs, vals, sizes, sens, lm, nobj = [], [], [], [], [], [], []
        cap = max((list(c.memory.buckets.values())[0].cap
                   for c in self.cores))
        for c in self.cores:
            (_, b), = c.memory.buckets.items()
            pad_n = cap - b.cap
            pad_o = o_cap - b.o_cap
            keys.append(jnp.pad(b.key, ((0, pad_n), (0, 0))))
            shrs.append(jnp.pad(b.shrinkage, ((0, pad_n),)))
            vals.append(jnp.pad(b.value, ((0, pad_n), (0, pad_o), (0, 0))))
            sizes.append(b.size)
            sens.append(jnp.pad(c.memory.get_sensory(),
                                ((0, pad_o), (0, 0), (0, 0), (0, 0))))
            lm.append(jnp.pad(c.last_mask, ((0, pad_o), (0, 0), (0, 0))))
            nobj.append(c.object_manager.num_obj)
        self.key = jnp.stack(keys)
        self.shr = jnp.stack(shrs)
        self.value = jnp.stack(vals)
        self.sizes = np.asarray(sizes)
        self.sensory = jnp.stack(sens)
        self.last_mask = jnp.stack(lm)
        self.num_obj = jnp.asarray(nobj, jnp.int32)
        self.o_cap = o_cap

    def _stepper(self):
        from deva_tpu.inference.fused_step import FusedStepper
        if not hasattr(self, "_fused"):
            self._fused = FusedStepper(self.model, self.cfg.top_k,
                                       use_pallas=self.cfg.use_pallas_attention,
                                       topk_method=self.cfg.topk_method)
        return self._fused

    @staticmethod
    def _wrap_raw(raw, pads):
        """Adapt a FusedStepper raw body (single-video arg list with unused
        long-term slots) to the batched per-video signature."""
        z2 = jnp.zeros((0, 1))
        z1 = jnp.zeros((0,))

        def body(image, num_obj, key, shr, value, size, sensory, last_mask,
                 variables):
            return raw(variables, image, pads, num_obj, key, shr, None,
                       value, None, None, size, z2, z1,
                       jnp.zeros((0, *value.shape[1:])), None, None, 0,
                       sensory, last_mask)
        return body

    def _fn(self, mem_write: bool, update_sensory: bool, pads):
        keyk = (mem_write, update_sensory, pads)
        if keyk in self._fns:
            return self._fns[keyk]
        raw = self._stepper()._raw_step(
            mem_write, update_sensory, use_lt=False, work_usage=False,
            count_lt_usage=False, slice_channels=False)
        body = self._wrap_raw(raw, pads)
        # donate the rings and per-frame state so updates happen in place
        # ([B, cap, O, Cv] ring copies are the dominant HBM traffic otherwise)
        donate = (2, 3, 4, 6, 7) if mem_write else (6, 7)
        fn = jax.jit(jax.vmap(body, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)),
                     donate_argnums=donate)
        self._fns[keyk] = fn
        return fn

    def _block_fn(self, n_read: int, write_last: bool, pads):
        keyk = ("block", n_read, write_last, pads)
        if keyk in self._fns:
            return self._fns[keyk]
        raw = self._stepper()._raw_block(
            n_read, write_last, use_lt=False, work_usage=False,
            count_lt_usage=False, slice_channels=False)
        body = self._wrap_raw(raw, pads)
        donate = (2, 3, 4, 6, 7) if write_last else (6, 7)
        fn = jax.jit(jax.vmap(body, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)),
                     donate_argnums=donate)
        self._fns[keyk] = fn
        return fn

    def reserve(self, n_writes: int):
        """Pre-size the rings for `n_writes` further memory writes so no
        growth (and therefore no recompile) happens mid-run."""
        hw = self._token_hw
        need = int(self.sizes.max()) + n_writes * hw
        if need > self.key.shape[1]:
            grow = need - self.key.shape[1]
            self.key = jnp.pad(self.key, ((0, 0), (0, grow), (0, 0)))
            self.shr = jnp.pad(self.shr, ((0, 0), (0, grow)))
            self.value = jnp.pad(self.value,
                                 ((0, 0), (0, grow), (0, 0), (0, 0)))

    def step_block(self, frames, end: bool = False) -> jnp.ndarray:
        """Advance every video K frames in ONE compiled launch.

        frames: [B, K, H, W, 3] (list of B [K, H, W, 3] accepted). The
        memory-write schedule must land only on the block's last frame
        (i.e. K must divide into the mem_every cadence); asserts otherwise.
        Returns probabilities [B, K, 1 + O_cap, H, W].
        """
        frames = jnp.stack([jnp.asarray(f, jnp.float32) for f in frames]) \
            if isinstance(frames, (list, tuple)) else jnp.asarray(frames)
        b, k, h, w = frames.shape[:4]
        last_mem = self._last_mem_ti()
        for i in range(1, k):
            assert (self.frame_idx + i) - last_mem < self.cfg.mem_every, \
                "a mid-block frame would be a memory frame; use a smaller K"
        write_last = ((self.frame_idx + k) - last_mem
                      >= self.cfg.mem_every) and not end
        pads = pad_amounts(h, w, 16)
        hw = ((h + pads[2] + pads[3]) // 16) * ((w + pads[0] + pads[1]) // 16)
        if write_last and int(self.sizes.max()) + hw > self.key.shape[1]:
            self.reserve(4)

        fn = self._block_fn(k - 1 if write_last else k, write_last, pads)
        (probs, self.sensory, self.last_mask, self.key, self.shr, _,
         self.value, _, _, _, _) = fn(
            frames, self.num_obj, self.key, self.shr, self.value,
            jnp.asarray(self.sizes), self.sensory, self.last_mask,
            self.variables)
        self.frame_idx += k
        if write_last:
            self.sizes = self.sizes + hw
            self._mem_ti = self.frame_idx
        return probs

    def step_all(self, frames: Sequence[np.ndarray],
                 end: bool = False) -> jnp.ndarray:
        """One lockstep frame for every video. frames: B arrays [H, W, 3].
        Returns probabilities [B, 1 + O_cap, H, W] (per-video live channels
        are the first 1 + num_obj[i])."""
        self.frame_idx += 1
        curr_ti = self.frame_idx
        is_mem = (curr_ti - self._last_mem_ti() >= self.cfg.mem_every) \
            and not end
        h, w = np.asarray(frames[0]).shape[:2]
        pads = pad_amounts(h, w, 16)
        hw = ((h + pads[2] + pads[3]) // 16) * ((w + pads[0] + pads[1]) // 16)
        if is_mem and int(self.sizes.max()) + hw > self.key.shape[1]:
            grow = hw * 4
            self.key = jnp.pad(self.key, ((0, 0), (0, grow), (0, 0)))
            self.shr = jnp.pad(self.shr, ((0, 0), (0, grow)))
            self.value = jnp.pad(self.value,
                                 ((0, 0), (0, grow), (0, 0), (0, 0)))

        fn = self._fn(is_mem, not end, pads)
        images = jnp.stack([jnp.asarray(f, jnp.float32) for f in frames])
        (probs, self.sensory, self.last_mask, self.key, self.shr, _,
         self.value, _, _, _, _) = fn(
            images, self.num_obj, self.key, self.shr, self.value,
            jnp.asarray(self.sizes), self.sensory, self.last_mask,
            self.variables)
        if is_mem:
            self.sizes = self.sizes + hw
            self._mem_ti = curr_ti
        return probs

    def _last_mem_ti(self) -> int:
        return getattr(self, "_mem_ti", 0)
