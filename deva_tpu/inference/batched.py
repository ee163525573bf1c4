"""Batched multi-video propagation: N videos advance in lockstep through ONE
vmapped compiled step (or K-frame block) per launch.

The reference is strictly single-stream (one video per GPU,
reference:evaluation/eval_vos.py); on TPU the fused step underutilizes the
MXU at batch 1, so propagating a batch of videos per launch multiplies
throughput. State for every video lives in stacked fixed-shape rings
([B, cap, ...]) with per-video size/num_obj scalars; the per-frame body is
the same `_raw_step` the single-video path uses (vmapped with
slice_channels=False so num_obj stays a traced per-video scalar) — the
equivalence tests check batched == sequential.

v2 scope: VOS-style propagation — one bucket per video created from the
first-frame mask — WITH long-term memory: stacked LT rings with per-video
sizes, lockstep consolidation (all videos share the memory-write schedule,
so their working sizes stay equal and saturate together; the prototype
selection/potentiation is vmapped over videos —
reference:deva/inference/memory_manager.py:207-276 under batching), and
per-video usage-based LT eviction. Videos shorter than the batch keep
stepping harmlessly; callers ignore their outputs past the end (`end`
semantics only affect post-output state, so per-frame outputs are unchanged
— see evaluation/eval_vos_batched.py).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.memory import (_consolidate_prototypes, _round_up)
from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops.pad import pad_amounts


class BatchedPropagator:
    def __init__(self, model: DEVANetwork, variables,
                 config: InferenceConfig, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — multi-chip
        serving shards the video axis of every stacked ring/state over it
        (SURVEY §2.8: "per-device video sharding inside one pod slice"); the
        per-video step body has no cross-video terms, so XLA partitions the
        whole launch with zero collectives on the hot path. The batch must
        divide evenly over the axis."""
        self.model = model
        self.variables = variables
        self.cfg = config
        self.use_lt = config.enable_long_term
        self.count_lt_usage = (config.enable_long_term and
                               config.enable_long_term_count_usage)
        self.mesh = mesh
        if mesh is not None:
            from deva_tpu.parallel.mesh import batch_spec, replicated_spec
            self._shard_video = batch_spec(mesh)
            self._shard_rep = replicated_spec(mesh)
            self.variables = jax.device_put(variables, self._shard_rep)
        self._fns: Dict = {}

    def initialize(self, images0: Sequence[np.ndarray],
                   masks0: Sequence[np.ndarray],
                   objects: Sequence[List[int]]):
        """Consume each video's first frame + ground-truth mask through the
        (single-video) reference path, then stack the resulting states."""
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            assert len(images0) % nd == 0, (
                f"batch {len(images0)} must divide over the {nd}-device "
                "'data' axis (pad the video group or shrink the mesh)")
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
        cfg = self.cfg
        keys, shrs, sels, vals, uses, lifes = [], [], [], [], [], []
        sizes, sens, lm, nobj = [], [], [], []
        cap = max(list(c.memory.buckets.values())[0].cap
                  for c in self.cores)
        if self.use_lt:
            hw = list(self.cores[0].memory.buckets.values())[0].size
            # consolidation triggers at size >= max_work AND size >
            # min_work + hw (the reference's min-size guard,
            # kv_memory_store.py:134-135) — so the ring must hold up to
            # max(max_work, min_work + 2*hw) tokens before compress fires
            cap = max(cap, _round_up(
                max(cfg.max_mid_term_frames,
                    cfg.min_mid_term_frames + 2) * hw, hw))
        for c in self.cores:
            (_, b), = c.memory.buckets.items()
            pad_n = cap - b.cap
            pad_o = o_cap - b.o_cap
            keys.append(jnp.pad(b.key, ((0, pad_n), (0, 0))))
            shrs.append(jnp.pad(b.shrinkage, ((0, pad_n),)))
            vals.append(jnp.pad(b.value, ((0, pad_n), (0, pad_o), (0, 0))))
            if self.use_lt:
                sels.append(jnp.pad(b.selection, ((0, pad_n), (0, 0))))
                uses.append(jnp.pad(b.use_cnt, ((0, pad_n),)))
                lifes.append(jnp.pad(b.life_cnt, ((0, pad_n),)))
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
        b = len(self.cores)
        if self.use_lt:
            self.sel = jnp.stack(sels)
            self.use_cnt = jnp.stack(uses)
            self.life_cnt = jnp.stack(lifes)
            ck = self.key.shape[-1]
            cv = self.value.shape[-1]
            # lazy LT capacity (doubled on demand in _maybe_consolidate):
            # attention pays FLOPs over the full masked capacity, so sizing
            # for max_long_term_elements up front costs ~10x for most of a
            # run (same policy as MemoryEngine._compress)
            lcap = _round_up(4 * cfg.num_prototypes, cfg.num_prototypes)
            dt = self.key.dtype
            self.lt_key = jnp.zeros((b, lcap, ck), dt)
            self.lt_shr = jnp.zeros((b, lcap), dt)
            self.lt_value = jnp.zeros((b, lcap, o_cap, cv), dt)
            self.lt_use = jnp.zeros((b, lcap), jnp.float32)
            self.lt_life = jnp.zeros((b, lcap), jnp.float32)
            self.lt_sizes = np.zeros((b,), np.int64)
        else:
            self.sel = self.use_cnt = self.life_cnt = None
            self.lt_sizes = np.zeros((b,), np.int64)

    @property
    def _lt_engaged(self) -> bool:
        return self.use_lt and bool((self.lt_sizes > 0).any())

    def _stepper(self):
        from deva_tpu.inference.fused_step import FusedStepper
        if not hasattr(self, "_fused"):
            self._fused = FusedStepper(self.model, self.cfg.top_k,
                                       use_pallas=self.cfg.resolve_use_pallas(),
                                       topk_method=self.cfg.topk_method)
        return self._fused

    def _wrap_raw(self, raw, pads, lt_engaged: bool):
        """Adapt a FusedStepper raw body (single-video arg list) to the
        batched per-video signature:

            body(image, num_obj, key, shr, sel, value, use, life, size,
                 lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
                 sensory, last_mask, variables)

        With long-term off, sel/use/life/lt_* are zero-size placeholders
        closed over so the vmapped signature stays uniform."""
        if self.use_lt:
            def body(image, num_obj, key, shr, sel, value, use, life, size,
                     lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
                     sensory, last_mask, variables):
                return raw(variables, image, pads, num_obj, key, shr, sel,
                           value, use, life, size, lt_key, lt_shr, lt_value,
                           lt_use if lt_engaged else None,
                           lt_life if lt_engaged else None,
                           lt_size, sensory, last_mask)
            return body

        z2 = jnp.zeros((0, 1))
        z1 = jnp.zeros((0,))

        def body(image, num_obj, key, shr, sel, value, use, life, size,
                 lt_key, lt_shr, lt_value, lt_use, lt_life, lt_size,
                 sensory, last_mask, variables):
            return raw(variables, image, pads, num_obj, key, shr, None,
                       value, None, None, size, z2, z1,
                       jnp.zeros((0, *value.shape[1:])), None, None, 0,
                       sensory, last_mask)
        return body

    def _vmap_jit(self, body, mem_write: bool, lt_engaged: bool):
        # axes: everything per-video (0) except variables (None); with LT off
        # the placeholder slots still carry per-video dummies of shape [B, 0]
        axes = (0,) * 17 + (None,)
        # donate the rings and per-frame state so updates happen in place
        # ([B, cap, O, Cv] ring copies are the dominant HBM traffic otherwise)
        donate = [15, 16]                       # sensory, last_mask
        if mem_write:
            donate += [2, 3, 5]                 # key, shr, value
            if self.use_lt:
                donate += [4]                   # sel
        if self.use_lt:
            donate += [6, 7]                    # use/life counters
            if self.count_lt_usage and lt_engaged:
                donate += [12, 13]              # lt_use, lt_life
        kwargs = {}
        if self.mesh is not None:
            # shard the video axis over 'data'; replicate the weights. All
            # 11 outputs keep their per-video leading axis.
            kwargs["in_shardings"] = (self._shard_video,) * 17 + (
                self._shard_rep,)
            kwargs["out_shardings"] = (self._shard_video,) * 11
        return jax.jit(jax.vmap(body, in_axes=axes),
                       donate_argnums=tuple(sorted(donate)), **kwargs)

    def _fn(self, mem_write: bool, update_sensory: bool, pads):
        lt_on = self._lt_engaged
        keyk = (mem_write, update_sensory, pads, lt_on)
        if keyk in self._fns:
            return self._fns[keyk]
        raw = self._stepper()._raw_step(
            mem_write, update_sensory, use_lt=lt_on,
            work_usage=self.use_lt, count_lt_usage=self.count_lt_usage,
            slice_channels=False)
        fn = self._vmap_jit(self._wrap_raw(raw, pads, lt_on), mem_write,
                            lt_on)
        self._fns[keyk] = fn
        return fn

    def _block_fn(self, n_read: int, write_last: bool, pads):
        lt_on = self._lt_engaged
        keyk = ("block", n_read, write_last, pads, lt_on)
        if keyk in self._fns:
            return self._fns[keyk]
        raw = self._stepper()._raw_block(
            n_read, write_last, use_lt=lt_on,
            work_usage=self.use_lt, count_lt_usage=self.count_lt_usage,
            slice_channels=False)
        fn = self._vmap_jit(self._wrap_raw(raw, pads, lt_on), write_last,
                            lt_on)
        self._fns[keyk] = fn
        return fn

    def _lt_args(self, b):
        if self.use_lt:
            return (self.lt_key, self.lt_shr, self.lt_value, self.lt_use,
                    self.lt_life, jnp.asarray(self.lt_sizes))
        z = jnp.zeros((b, 0))
        return (z, z, z, z, z, jnp.zeros((b,), jnp.int32))

    def _run(self, fn, images):
        b = images.shape[0]
        args = (images, self.num_obj, self.key, self.shr,
                self.sel if self.use_lt else jnp.zeros((b, 0)),
                self.value,
                self.use_cnt if self.use_lt else jnp.zeros((b, 0)),
                self.life_cnt if self.use_lt else jnp.zeros((b, 0)),
                jnp.asarray(self.sizes), *self._lt_args(b),
                self.sensory, self.last_mask)
        if self.mesh is not None:
            # lay the video axis out over 'data' (no-op once the state is
            # already sharded — i.e. every launch after the first, except
            # right after a host-side consolidation/eviction rebuild)
            args = tuple(jax.device_put(a, self._shard_video) for a in args)
        out = fn(*args, self.variables)
        (probs, self.sensory, self.last_mask, key, shr, sel, value,
         use_cnt, life_cnt, lt_use, lt_life) = out
        self.key, self.shr, self.value = key, shr, value
        if self.use_lt:
            self.sel = sel
            self.use_cnt, self.life_cnt = use_cnt, life_cnt
            if self.count_lt_usage and self._lt_engaged:
                self.lt_use, self.lt_life = lt_use, lt_life
        return probs

    def reserve(self, n_writes: int):
        """Pre-size the rings for `n_writes` further memory writes so no
        growth (and therefore no recompile) happens mid-run. With long-term
        memory the working set is already capped at max_mid_term_frames."""
        hw = self._token_hw
        if self.use_lt:
            return  # rings already sized for the compress trigger in _stack
        need = int(self.sizes.max()) + n_writes * hw
        if need > self.key.shape[1]:
            self._grow_rings(need - self.key.shape[1])

    def _grow_rings(self, grow: int):
        self.key = jnp.pad(self.key, ((0, 0), (0, grow), (0, 0)))
        self.shr = jnp.pad(self.shr, ((0, 0), (0, grow)))
        self.value = jnp.pad(self.value,
                             ((0, 0), (0, grow), (0, 0), (0, 0)))
        if self.use_lt:
            # degenerate configs (consolidation blocked by the min-size
            # guard) grow mid-run with the LT side rings live
            self.sel = jnp.pad(self.sel, ((0, 0), (0, grow), (0, 0)))
            self.use_cnt = jnp.pad(self.use_cnt, ((0, 0), (0, grow)))
            self.life_cnt = jnp.pad(self.life_cnt, ((0, 0), (0, grow)))

    # -- long-term consolidation (lockstep over the batch) -----------------

    def _maybe_consolidate(self):
        """All videos share one write schedule, so their working sizes stay
        equal and saturate together; consolidate the whole batch in lockstep.
        Mirrors MemoryEngine.maybe_consolidate/_compress/_evict_obsolete
        (reference:deva/inference/memory_manager.py:207-276,
        kv_memory_store.py:127-185) with the prototype math vmapped."""
        if not self.use_lt:
            return
        cfg = self.cfg
        size = int(self.sizes[0])
        hw = self._token_hw
        max_work = cfg.max_mid_term_frames * hw
        min_work = cfg.min_mid_term_frames * hw
        if size < max_work:
            return
        if size <= min_work + hw:
            return

        # usage-based eviction of least-used LT tokens for videos at the cap
        limit = cfg.max_long_term_elements - cfg.num_prototypes
        if (self.lt_sizes >= limit).any():
            # without LT usage counting every token's usage is 0 and the
            # strictly-greater threshold would silently evict the ENTIRE
            # long-term memory; the single-video path and the reference
            # both require counting before eviction can be meaningful
            # (reference:deva/inference/memory_manager.py:211-216)
            assert self.count_lt_usage, (
                "long-term memory saturated but enable_long_term_count_usage"
                " is False; enable it (the reference's long-video policy) so"
                " eviction has usage statistics to rank tokens by")
            self._evict_obsolete(limit)

        start, end = hw, size - min_work + hw
        cand = slice(start, end)
        usage = self.use_cnt / self.life_cnt
        proto_key, proto_shr, proto_value = jax.vmap(
            lambda k, s, e, v, u: _consolidate_prototypes(
                k, s, e, v, u, num_prototypes=cfg.num_prototypes))(
            self.key[:, cand], self.shr[:, cand], self.sel[:, cand],
            self.value[:, cand], usage[:, cand])

        # sieve: keep [0:start] + [end:size] (same window for every video)
        def sieve(a):
            head = a[:, :start]
            tail = a[:, end:size]
            out = jnp.concatenate([head, tail], axis=1)
            pad = [(0, 0)] * a.ndim
            pad[1] = (0, a.shape[1] - out.shape[1])
            return jnp.pad(out, pad)

        self.key = sieve(self.key)
        self.shr = sieve(self.shr)
        self.sel = sieve(self.sel)
        self.value = sieve(self.value)
        self.use_cnt = sieve(self.use_cnt)
        self.life_cnt = sieve(self.life_cnt)
        self.sizes = np.full_like(self.sizes, start + (size - end))

        # append prototypes at each video's LT cursor (growing the lazy
        # capacity when the batch max approaches it)
        p = proto_key.shape[1]  # == num_prototypes unless window-clamped
        lcap = self.lt_key.shape[1]
        if int(self.lt_sizes.max()) + p > lcap:
            max_cap = _round_up(cfg.max_long_term_elements, p)
            new_cap = min(_round_up(max(lcap * 2,
                                        int(self.lt_sizes.max()) + p), p),
                          max_cap)
            grow = new_cap - lcap
            self.lt_key = jnp.pad(self.lt_key, ((0, 0), (0, grow), (0, 0)))
            self.lt_shr = jnp.pad(self.lt_shr, ((0, 0), (0, grow)))
            self.lt_value = jnp.pad(self.lt_value,
                                    ((0, 0), (0, grow), (0, 0), (0, 0)))
            self.lt_use = jnp.pad(self.lt_use, ((0, 0), (0, grow)))
            self.lt_life = jnp.pad(self.lt_life, ((0, 0), (0, grow)))
        offs = jnp.asarray(self.lt_sizes)

        def append(lt, new):
            return jax.vmap(
                lambda ring, x, o: jax.lax.dynamic_update_slice(
                    ring, x.astype(ring.dtype),
                    (o,) + (0,) * (ring.ndim - 1)))(lt, new, offs)

        self.lt_key = append(self.lt_key, proto_key)
        self.lt_shr = append(self.lt_shr, proto_shr)
        self.lt_value = append(self.lt_value, proto_value)
        zeros = jnp.zeros((len(self.cores), p), jnp.float32)
        self.lt_use = append(self.lt_use, zeros)
        self.lt_life = append(self.lt_life, zeros + 1e-7)
        self.lt_sizes = self.lt_sizes + p

    def _evict_obsolete(self, max_size: int):
        """Per-video usage eviction with the strictly-greater threshold
        semantics of reference:kv_memory_store.py:164-185; survivors keep
        their original order via a stable gather."""
        lcap = self.lt_key.shape[1]
        lt_use = np.asarray(self.lt_use)
        lt_life = np.asarray(self.lt_life)
        orders = []
        new_sizes = self.lt_sizes.copy()
        for v in range(len(self.cores)):
            n = int(self.lt_sizes[v])
            k = n - max_size
            if k <= 0:
                orders.append(np.arange(lcap))
                continue
            usage = lt_use[v, :n] / lt_life[v, :n]
            thresh = np.partition(usage, k - 1)[k - 1]
            survived = usage > thresh
            orders.append(np.concatenate([
                np.nonzero(survived)[0], np.nonzero(~survived)[0],
                np.arange(n, lcap)]))
            new_sizes[v] = int(survived.sum())
        idx = jnp.asarray(np.stack(orders), jnp.int32)

        def gather(a):
            ix = idx.reshape(idx.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, ix, axis=1)

        self.lt_key = gather(self.lt_key)
        self.lt_shr = gather(self.lt_shr)
        self.lt_value = gather(self.lt_value)
        self.lt_use = gather(self.lt_use)
        self.lt_life = gather(self.lt_life)
        self.lt_sizes = new_sizes

    # -- stepping -----------------------------------------------------------

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
        if write_last and not self.use_lt and \
                int(self.sizes.max()) + hw > self.key.shape[1]:
            self.reserve(4)

        fn = self._block_fn(k - 1 if write_last else k, write_last, pads)
        probs = self._run(fn, frames)
        self.frame_idx += k
        if write_last:
            self.sizes = self.sizes + hw
            self._mem_ti = self.frame_idx
            self._maybe_consolidate()
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
        if is_mem and not self.use_lt and \
                int(self.sizes.max()) + hw > self.key.shape[1]:
            self._grow_rings(hw * 4)

        fn = self._fn(is_mem, not end, pads)
        images = jnp.stack([jnp.asarray(f, jnp.float32) for f in frames])
        probs = self._run(fn, images)
        if is_mem:
            self.sizes = self.sizes + hw
            self._mem_ti = curr_ti
            self._maybe_consolidate()
        return probs

    def _last_mem_ti(self) -> int:
        return getattr(self, "_mem_ti", 0)

    def launch_cost(self, frames) -> dict:
        """XLA cost analysis of the block launch that `step_block(frames)`
        would run right now (same cache key/state). Returns the compiler's
        estimate, e.g. {'flops': ...} — the honest numerator for an MFU
        report (VERDICT r2: 'report MFU … via cost_analysis')."""
        frames = jnp.asarray(frames)
        b, k, h, w = frames.shape[:4]
        last_mem = self._last_mem_ti()
        write_last = (self.frame_idx + k) - last_mem >= self.cfg.mem_every
        pads = pad_amounts(h, w, 16)
        fn = self._block_fn(k - 1 if write_last else k, write_last, pads)
        args = (frames, self.num_obj, self.key, self.shr,
                self.sel if self.use_lt else jnp.zeros((b, 0)),
                self.value,
                self.use_cnt if self.use_lt else jnp.zeros((b, 0)),
                self.life_cnt if self.use_lt else jnp.zeros((b, 0)),
                jnp.asarray(self.sizes), *self._lt_args(b),
                self.sensory, self.last_mask, self.variables)
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        return dict(cost) if cost else {}
