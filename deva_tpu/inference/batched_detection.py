"""Lockstep multi-video stepping for multi-bucket videos (detection fusion
and mid-stream VOS), with long-term memory.

The reference's detection-driven eval is strictly single-stream
(reference:evaluation/eval_with_detections.py:205-265): per video, the
semi-online machine buffers frames, votes a consensus, incorporates the
detection, then propagates. The model-heavy parts of that loop — the plain
propagation frames and the forward prediction `_segment` inside
`incorporate_detection` (reference:deva/inference/inference_core.py:137-198)
— have no cross-video coupling, so on TPU they batch across videos into one
vmapped launch; only consensus/ILP/match-and-merge (host work + per-video
model calls at a 1-in-detection_every cadence) stay sequential.

Unlike the VOS-style BatchedPropagator (one bucket per video), these videos
hold MULTI-BUCKET memory: objects first seen at different detections share
separate top-k normalization sets (reference:deva/inference/
kv_memory_store.py:10-33). Here each video's buckets are stacked into
fixed-shape SLOT arrays [S, cap, ...] (S = padded bucket count); the
vmapped per-frame body attends each slot against the shared queries with
its own validity window and scatters per-slot readout rows into the global
object rows — identical math to MemoryEngine.match_memory, batched.

Long-term memory stacks the same way: per-slot LT rings [S, lcap, ...]
with per-(video, slot) sizes; every read attends [LT ; work] concatenated
per slot and accrues usage, and consolidation runs host-side in lockstep
over whichever (video, slot) pairs hit the trigger — sizes advance in
whole-frame quanta, so every triggered pair sits at exactly
max_work_tokens and the prototype windows stack uniformly
(reference:deva/inference/memory_manager.py:207-276 under batching).

Memory-write schedules may diverge across the batch (a mid-stream mask or
detection resets that video's cadence): per-video curr_ti/last_mem_ti
clocks drive MASKED write launches (see _body). State is attached from /
detached to ordinary per-video InferenceCores, so detection/mask events
run the reference-parity single-video code in between.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.memory import (LongTermBucket,
                                       _consolidate_prototypes, _round_up)
from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops.pad import pad_amounts


def _slot_bucket(n: int) -> int:
    for b in (1, 2, 4, 8, 16, 32):
        if n <= b:
            return b
    return n


class BatchedDetectionPropagator:
    def __init__(self, model: DEVANetwork, variables,
                 config: InferenceConfig, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — multi-chip
        serving shards the video axis of every stacked slot array over it
        (SURVEY §2.8: "per-device video sharding inside one pod slice");
        the per-video body has no cross-video terms, so XLA partitions the
        launch with zero collectives on the hot path. The attached batch
        must divide evenly over the axis."""
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

    # -- stacking ----------------------------------------------------------

    def attach(self, cores: Sequence[InferenceCore]) -> None:
        """Stack the cores' multi-bucket state. Cores share one padded
        resolution. A core that is NOT engaged (its detections have all come
        up empty so far, or every object was purged after repeated missed
        detections — production tolerates num_obj == 0,
        reference:deva/inference/inference_core.py:57-59) rides along as an
        EMPTY lane: zero-size rings (the vmapped body's 1-token attention
        floor and rowcnt masks make it NaN-free and side-effect-free), and
        detach restores only its frame clocks. It re-enters normally once a
        later detection engages it."""
        self.cores = list(cores)
        b = len(cores)
        assert b > 0
        eng = [c.memory is not None and c.memory.engaged for c in cores]
        self._engaged = eng
        assert any(eng), (
            "attach needs at least one engaged video to define the stacked "
            "shapes; step all-empty groups per-core instead")
        ref = cores[eng.index(True)]
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            assert b % nd == 0, (
                f"batch {b} must divide over the {nd}-device 'data' axis "
                "(pad the video group or shrink the mesh)")
        engaged_cores = [c for c, e in zip(cores, eng) if e]
        for c in engaged_cores:
            assert c.memory.use_long_term == self.use_lt
            # lockstep state is stacked into shared-shape arrays: a core
            # with a different padded resolution / dims / ring dtype would
            # silently advance sizes in the wrong hw quantum
            assert c.memory.hw == ref.memory.hw, \
                "all videos in a batch must share the padded resolution"
            assert (c.memory.ck, c.memory.cv) == (ref.memory.ck,
                                                  ref.memory.cv)
            assert (list(c.memory.buckets.values())[0].key.dtype ==
                    list(ref.memory.buckets.values())[0].key.dtype), \
                "all videos in a batch must share the ring dtype"
        self.o_cap = max(max(c.o_cap for c in cores), 1)
        n_slots = _slot_bucket(max(len(c.memory.buckets)
                                   for c in engaged_cores))
        self.n_slots = n_slots
        self.o_slot = max(bk.o_cap for c in engaged_cores
                          for bk in c.memory.buckets.values())
        cap = max(bk.cap for c in engaged_cores
                  for bk in c.memory.buckets.values())
        self.hw = ref.memory.hw
        cap = _round_up(cap, self.hw)
        ck, cv = ref.memory.ck, ref.memory.cv
        self._ck, self._cv = ck, cv
        dt = list(ref.memory.buckets.values())[0].key.dtype
        self._ring_dtype = dt

        self.sizes = np.zeros((b, n_slots), np.int64)
        self.rowcnt = np.zeros((b, n_slots), np.int64)
        rowmaps = np.zeros((b, n_slots, self.o_slot), np.int64)
        nobj = []
        self._slot_bids: List[List[int]] = []
        videos, vspec = [], []
        for vi, c in enumerate(cores):
            obj_rows = {o.id: t - 1
                        for o, t in c.object_manager.obj_to_tmp_id.items()}
            bids = sorted(c.memory.buckets.keys()) if eng[vi] else []
            self._slot_bids.append(bids)
            v = {"k": [], "s": [], "v": []}
            slots = []
            if self.use_lt:
                v.update(sel=[], u=[], l=[],
                         ltk=[], lts=[], ltv=[], ltu=[], ltl=[])
            lt_slots = []
            for si, bid in enumerate(bids):
                bk = c.memory.buckets[bid]
                v["k"].append(bk.key)
                v["s"].append(bk.shrinkage)
                v["v"].append(bk.value)
                slots.append((bk.cap, bk.o_cap))
                if self.use_lt:
                    v["sel"].append(bk.selection)
                    v["u"].append(bk.use_cnt)
                    v["l"].append(bk.life_cnt)
                    lt = c.memory.long_buckets.get(bid)
                    if lt is not None:
                        has_use = lt.use_cnt is not None
                        lt_slots.append((lt.cap, lt.o_cap, has_use))
                        v["ltk"].append(lt.key)
                        v["lts"].append(lt.shrinkage)
                        v["ltv"].append(lt.value)
                        v["ltu"].append(lt.use_cnt if has_use else None)
                        v["ltl"].append(lt.life_cnt if has_use else None)
                    else:
                        lt_slots.append(None)
                        for kk in ("ltk", "lts", "ltv", "ltu", "ltl"):
                            v[kk].append(None)
                self.sizes[vi, si] = bk.size
                self.rowcnt[vi, si] = len(bk.obj_ids)
                rowmaps[vi, si, :len(bk.obj_ids)] = [obj_rows[o]
                                                     for o in bk.obj_ids]
            if eng[vi]:
                v["sen"] = c.memory.sensory
                v["lm"] = c.last_mask
                sen_o = c.memory.sensory.shape[0]
                lm_o = c.last_mask.shape[0]
            else:
                sen_o = lm_o = 0
            videos.append(v)
            vspec.append((bool(eng[vi]), tuple(slots), tuple(lt_slots),
                          sen_o, lm_o))
            nobj.append(c.object_manager.num_obj if eng[vi] else 0)
        if self.use_lt:
            self.lt_sizes = np.zeros((b, n_slots), np.int64)
            lcap = self.cfg.num_prototypes
            for vi, c in enumerate(cores):
                for si, bid in enumerate(self._slot_bids[vi]):
                    lt = c.memory.long_buckets.get(bid)
                    if lt is not None:
                        self.lt_sizes[vi, si] = lt.size
                        lcap = max(lcap, lt.cap)
            lcap = _round_up(lcap, self.cfg.num_prototypes)
        else:
            lcap = 0
        spec = (n_slots, cap, self.o_slot, self.o_cap, lcap, ck, cv,
                np.dtype(dt).name,
                ref.memory.sensory.shape[1:],
                np.dtype(ref.memory.sensory.dtype).name,
                ref.last_mask.shape[1:],
                np.dtype(ref.last_mask.dtype).name,
                tuple(vspec))
        out = self._pack_call(videos, spec)
        self.key, self.shr, self.value = out["key"], out["shr"], out["value"]
        self.sensory, self.last_mask = out["sen"], out["lm"]
        if self.use_lt:
            self.sel = out["sel"]
            self.use_cnt, self.life_cnt = out["use"], out["life"]
            self.lt_key, self.lt_shr = out["ltk"], out["lts"]
            self.lt_value = out["ltv"]
            self.lt_use, self.lt_life = out["ltu"], out["ltl"]
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

    def _pack_call(self, videos, spec):
        """Stack every per-bucket ring into the padded slot arrays in ONE
        jitted dispatch. attach used to issue one .at[].set per (video,
        slot, ring) — ~6*B*S tiny launches through the tunneled backend
        (~0.9 s/cycle at batch 8 in the detection bench); packed, the same
        math is a single executable. Shapes recur once rings saturate, so
        the trace cache (keyed on the full static spec) stabilizes after
        warmup."""
        keyk = ("pack", spec)
        if keyk not in self._fns:
            (n_slots, cap, o_slot, o_cap, lcap, ck, cv, ring_dt,
             sen_tail, sen_dt, lm_tail, lm_dt, vspec) = spec
            use_lt = self.use_lt

            def fn(videos):
                out = {"key": [], "shr": [], "value": [], "sen": [],
                       "lm": []}
                if use_lt:
                    out.update(sel=[], use=[], life=[], ltk=[], lts=[],
                               ltv=[], ltu=[], ltl=[])
                for v, (engd, slots, lt_slots, sen_o, lm_o) in zip(videos,
                                                                   vspec):
                    ks = jnp.zeros((n_slots, cap, ck), ring_dt)
                    ss = jnp.zeros((n_slots, cap), ring_dt)
                    vs = jnp.zeros((n_slots, cap, o_slot, cv), ring_dt)
                    if use_lt:
                        sl = jnp.zeros((n_slots, cap, ck), ring_dt)
                        us = jnp.zeros((n_slots, cap), jnp.float32)
                        lf = jnp.zeros((n_slots, cap), jnp.float32)
                        lk = jnp.zeros((n_slots, lcap, ck), ring_dt)
                        lsh = jnp.zeros((n_slots, lcap), ring_dt)
                        lv = jnp.zeros((n_slots, lcap, o_slot, cv), ring_dt)
                        lu = jnp.zeros((n_slots, lcap), jnp.float32)
                        ll = jnp.zeros((n_slots, lcap), jnp.float32)
                    for si, (bcap, bo) in enumerate(slots):
                        ks = ks.at[si, :bcap].set(v["k"][si])
                        ss = ss.at[si, :bcap].set(v["s"][si])
                        vs = vs.at[si, :bcap, :bo].set(v["v"][si])
                        if use_lt:
                            sl = sl.at[si, :bcap].set(v["sel"][si])
                            us = us.at[si, :bcap].set(v["u"][si])
                            lf = lf.at[si, :bcap].set(v["l"][si])
                    if use_lt:
                        for si, lspec in enumerate(lt_slots):
                            if lspec is None:
                                continue
                            lcap_i, lo, has_use = lspec
                            lk = lk.at[si, :lcap_i].set(v["ltk"][si])
                            lsh = lsh.at[si, :lcap_i].set(v["lts"][si])
                            lv = lv.at[si, :lcap_i, :lo].set(v["ltv"][si])
                            if has_use:
                                lu = lu.at[si, :lcap_i].set(v["ltu"][si])
                                ll = ll.at[si, :lcap_i].set(v["ltl"][si])
                    if engd:
                        sen = jnp.pad(
                            v["sen"], ((0, o_cap - sen_o),) + ((0, 0),) * 3)
                        lm = jnp.pad(
                            v["lm"], ((0, o_cap - lm_o), (0, 0), (0, 0)))
                    else:
                        # empty lane: fresh zero state at the batch's shared
                        # shapes (a purged core's stale sensory/last_mask
                        # must not leak in)
                        sen = jnp.zeros((o_cap,) + sen_tail, sen_dt)
                        lm = jnp.zeros((o_cap,) + lm_tail, lm_dt)
                    out["key"].append(ks)
                    out["shr"].append(ss)
                    out["value"].append(vs)
                    out["sen"].append(sen)
                    out["lm"].append(lm)
                    if use_lt:
                        out["sel"].append(sl)
                        out["use"].append(us)
                        out["life"].append(lf)
                        out["ltk"].append(lk)
                        out["lts"].append(lsh)
                        out["ltv"].append(lv)
                        out["ltu"].append(lu)
                        out["ltl"].append(ll)
                return {kk: jnp.stack(vv) for kk, vv in out.items()}

            self._fns[keyk] = jax.jit(fn)
        return self._fns[keyk](videos)

    def detach(self) -> None:
        """Write the advanced stacked state back into the per-video cores
        (so consensus/incorporate run reference-parity single-video code)."""
        # host pass 1: capacity planning + LongTermBucket creation (pure
        # python), building the static spec for the single unpack dispatch
        vspec = []
        for vi, c in enumerate(self.cores):
            if not self._engaged[vi]:
                # empty lane: only the frame clocks advanced; its (absent)
                # memory, sensory and last_mask stay untouched so a later
                # incorporate_detection re-engages it from a clean state
                c.curr_ti = int(self.curr_ti[vi])
                c.last_mem_ti = int(self.last_mem_ti[vi])
                vspec.append((False, 0, ()))
                continue
            slots = []
            for si, bid in enumerate(self._slot_bids[vi]):
                bk = c.memory.buckets[bid]
                need = int(self.sizes[vi, si])
                # plan (not ensure): the unpack overwrites every ring anyway,
                # so padding the old arrays first would be a dead copy
                cap = bk.plan_capacity(need - bk.size, self.hw,
                                       limit=(c.memory.max_work_tokens
                                              if self.use_lt else None)) \
                    if need > bk.cap else bk.cap
                lspec = None
                if self.use_lt:
                    lt_size = int(self.lt_sizes[vi, si])
                    lt = c.memory.long_buckets.get(bid)
                    if lt is None and lt_size > 0:
                        p = self.cfg.num_prototypes
                        lt = LongTermBucket(
                            bk.obj_ids, bk.o_cap, _round_up(lt_size, p),
                            self._ck, self._cv,
                            save_usage=self.count_lt_usage,
                            dtype=self._ring_dtype)
                        c.memory.long_buckets[bid] = lt
                    if lt is not None:
                        lcap = lt.cap if lt_size <= lt.cap else \
                            _round_up(lt_size, self.cfg.num_prototypes)
                        lspec = (lcap, lt.o_cap, lt.use_cnt is not None)
                slots.append((cap, bk.o_cap, lspec))
            vspec.append((True, c.o_cap, tuple(slots)))
        out = self._unpack_call(tuple(vspec))

        # host pass 2: assign the unpacked rings back into the cores
        for vi, c in enumerate(self.cores):
            if not self._engaged[vi]:
                continue
            ov = out[vi]
            for si, bid in enumerate(self._slot_bids[vi]):
                bk = c.memory.buckets[bid]
                d = ov["slots"][si]
                bk.key, bk.shrinkage, bk.value = d["k"], d["s"], d["v"]
                bk.size = int(self.sizes[vi, si])
                if self.use_lt:
                    bk.selection = d["sel"]
                    bk.use_cnt, bk.life_cnt = d["u"], d["l"]
                    lt = c.memory.long_buckets.get(bid)
                    if lt is not None:
                        lt.key, lt.shrinkage = d["ltk"], d["lts"]
                        lt.value = d["ltv"]
                        if lt.use_cnt is not None:
                            lt.use_cnt, lt.life_cnt = d["ltu"], d["ltl"]
                        lt.size = int(self.lt_sizes[vi, si])
            c.memory.update_sensory(ov["sen"])
            c.last_mask = ov["lm"]
            c.curr_ti = int(self.curr_ti[vi])
            c.last_mem_ti = int(self.last_mem_ti[vi])

    def _unpack_call(self, vspec):
        """detach's device work in ONE jitted dispatch (mirror of
        _pack_call): slice/pad every stacked slot ring back to its bucket's
        planned capacity. vspec: per video (engaged, core_o_cap, slots);
        slots: per slot (target_cap, bucket_o_cap, lt_spec) with lt_spec
        None or (target_lt_cap, lt_o_cap, has_usage)."""
        keyk = ("unpack", vspec)
        if keyk not in self._fns:
            use_lt = self.use_lt

            def fn(key, shr, value, sel, use, life, ltk, lts, ltv, ltu, ltl,
                   sensory, last_mask):
                def fit(a, cap):
                    # stacked cap and the bucket's own may differ either way
                    if a.shape[0] >= cap:
                        return a[:cap]
                    pad = [(0, cap - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                    return jnp.pad(a, pad)

                res = []
                for vi, (engd, core_o, slots) in enumerate(vspec):
                    if not engd:
                        res.append(None)
                        continue
                    ov = {"slots": [], "sen": sensory[vi, :core_o],
                          "lm": last_mask[vi, :core_o]}
                    for si, (cap, bo, lspec) in enumerate(slots):
                        d = {"k": fit(key[vi, si], cap),
                             "s": fit(shr[vi, si], cap),
                             "v": fit(value[vi, si, :, :bo], cap)}
                        if use_lt:
                            d["sel"] = fit(sel[vi, si], cap)
                            d["u"] = fit(use[vi, si], cap)
                            d["l"] = fit(life[vi, si], cap)
                            if lspec is not None:
                                lcap, lo, has_use = lspec
                                d["ltk"] = fit(ltk[vi, si], lcap)
                                d["lts"] = fit(lts[vi, si], lcap)
                                d["ltv"] = fit(ltv[vi, si, :, :lo], lcap)
                                if has_use:
                                    d["ltu"] = fit(ltu[vi, si], lcap)
                                    d["ltl"] = fit(ltl[vi, si], lcap)
                        ov["slots"].append(d)
                    res.append(ov)
                return res

            self._fns[keyk] = jax.jit(fn)
        if self.use_lt:
            lt_args = (self.sel, self.use_cnt, self.life_cnt, self.lt_key,
                       self.lt_shr, self.lt_value, self.lt_use, self.lt_life)
        else:
            z = jnp.zeros((len(self.cores), self.n_slots, 0))
            lt_args = (z, z, z, z, z, z, z, z)
        return self._fns[keyk](self.key, self.shr, self.value, *lt_args,
                               self.sensory, self.last_mask)

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
        use_lt = self.use_lt
        count_lt = self.count_lt_usage
        from deva_tpu.inference.fused_step import FusedStepper
        if not hasattr(self, "_stepper"):
            self._stepper = FusedStepper(model, cfg.top_k,
                                         use_pallas=cfg.resolve_use_pallas(),
                                         topk_method=cfg.topk_method)
        stepper = self._stepper
        if masked_write:
            assert mem_write and update_sensory, \
                "masked writes only arise on non-end frames with a writer"

        def fn(image, do_write, num_obj, keys, shrs, sels, values, use,
               life, lt_keys, lt_shrs, lt_values, lt_use, lt_life, sizes,
               lt_sizes, rowmaps, rowcnt, sensory, last_mask, variables):
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
                # scatter zero rows; usage accrues only on truly valid
                # tokens (arange < size, not the 1-token floor)
                valid = jnp.arange(cap) < jnp.maximum(sizes[s], 1)
                if use_lt:
                    lcap = lt_keys.shape[1]
                    lt_valid = jnp.arange(lcap) < lt_sizes[s]
                    rd, usage = stepper._attend(
                        jnp.concatenate([lt_keys[s], keys[s]], 0),
                        jnp.concatenate([lt_shrs[s], shrs[s]], 0),
                        jnp.concatenate([lt_values[s], values[s]], 0),
                        jnp.concatenate([lt_valid, valid]),
                        qk, qe, want_usage=True)
                    valid_w = jnp.arange(cap) < sizes[s]
                    use = use.at[s].add(
                        jnp.where(valid_w, usage[lcap:], 0.0))
                    life = life.at[s].add(jnp.where(valid_w, 1.0, 0.0))
                    if count_lt:
                        lt_use = lt_use.at[s].add(
                            jnp.where(lt_valid, usage[:lcap], 0.0))
                        lt_life = lt_life.at[s].add(
                            jnp.where(lt_valid, 1.0, 0.0))
                else:
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
                    if use_lt:
                        sels = sels.at[s].set(jax.lax.dynamic_update_slice(
                            sels[s], qe.astype(sels.dtype), (sizes[s], 0)))
                        zeros = jnp.zeros((hq * wq,), jnp.float32)
                        use = use.at[s].set(jax.lax.dynamic_update_slice(
                            use[s], zeros, (sizes[s],)))
                        life = life.at[s].set(jax.lax.dynamic_update_slice(
                            life[s], zeros + 1e-7, (sizes[s],)))

            h, w = image.shape[:2]
            prob_out = prob[0, :, lh:lh + h, lw:lw + w]
            return (prob_out, new_sensory, new_last_mask, keys, shrs, sels,
                    values, use, life, lt_use, lt_life)

        return fn

    def _block_body(self, n_slots: int, n_read: int, write_last: bool,
                    pads, masked_write: bool = False, end: bool = False):
        """n_read read-only frames via lax.scan (the rings are
        loop-invariant, so the carry is only sensory/last_mask and the
        usage counters) plus optionally ONE trailing (possibly masked)
        memory-write frame — one compiled launch per memory period, same
        structure as FusedStepper._raw_block. frames: [K, H, W, 3].

        end=True freezes sensory on the block's LAST frame (the reference's
        end-of-video semantics, update_sensory = not is_last; cannot combine
        with write_last — step() never writes memory on an end frame)."""
        read = self._body(n_slots, False, True, pads, False)
        write = self._body(n_slots, True, True, pads, masked_write) \
            if write_last else None
        assert not (end and write_last)
        read_end = self._body(n_slots, False, False, pads, False) \
            if end else None
        n_scan = n_read - 1 if end else n_read

        def fn(frames, do_write, num_obj, keys, shrs, sels, values, use,
               life, lt_keys, lt_shrs, lt_values, lt_use, lt_life, sizes,
               lt_sizes, rowmaps, rowcnt, sensory, last_mask, variables):
            def body(carry, frame):
                sensory, last_mask, use, life, lt_use, lt_life = carry
                (prob, sensory, last_mask, _k, _s, _sel, _v, use, life,
                 lt_use, lt_life) = read(
                    frame, do_write, num_obj, keys, shrs, sels, values,
                    use, life, lt_keys, lt_shrs, lt_values, lt_use,
                    lt_life, sizes, lt_sizes, rowmaps, rowcnt, sensory,
                    last_mask, variables)
                return (sensory, last_mask, use, life, lt_use, lt_life), \
                    prob

            carry = (sensory, last_mask, use, life, lt_use, lt_life)
            if n_scan > 0:
                carry, probs = jax.lax.scan(body, carry, frames[:n_scan])
            else:
                probs = None
            sensory, last_mask, use, life, lt_use, lt_life = carry
            if end:
                (prob_e, sensory, last_mask, _k, _s, _sel, _v, use, life,
                 lt_use, lt_life) = read_end(
                    frames[n_scan], do_write, num_obj, keys, shrs, sels,
                    values, use, life, lt_keys, lt_shrs, lt_values, lt_use,
                    lt_life, sizes, lt_sizes, rowmaps, rowcnt, sensory,
                    last_mask, variables)
                probs = prob_e[None] if probs is None else \
                    jnp.concatenate([probs, prob_e[None]], 0)
            if write_last:
                (prob_w, sensory, last_mask, keys, shrs, sels, values, use,
                 life, lt_use, lt_life) = write(
                    frames[n_read], do_write, num_obj, keys, shrs, sels,
                    values, use, life, lt_keys, lt_shrs, lt_values, lt_use,
                    lt_life, sizes, lt_sizes, rowmaps, rowcnt, sensory,
                    last_mask, variables)
                probs = prob_w[None] if probs is None else \
                    jnp.concatenate([probs, prob_w[None]], 0)
            return (probs, sensory, last_mask, keys, shrs, sels, values,
                    use, life, lt_use, lt_life)

        return fn

    def _donation(self, mem_write: bool, donate: bool):
        dn = ()
        if donate:
            dn = (18, 19)                       # sensory, last_mask
            if mem_write:
                dn += (3, 4, 6)                 # keys, shrs, values
                if self.use_lt:
                    dn += (5,)                  # sels
            if self.use_lt:
                dn += (7, 8)                    # use, life
                if self.count_lt_usage:
                    dn += (12, 13)              # lt_use, lt_life
        return tuple(sorted(dn))

    def _jit_kwargs(self):
        if self.mesh is None:
            return {}
        # shard the video axis over 'data'; replicate the weights. All 11
        # outputs keep their per-video leading axis.
        return {"in_shardings": (self._shard_video,) * 20 + (
                    self._shard_rep,),
                "out_shardings": (self._shard_video,) * 11}

    def _fn(self, mem_write: bool, update_sensory: bool, pads,
            donate: bool = True, masked_write: bool = False):
        keyk = (self.n_slots, mem_write, update_sensory, pads, donate,
                masked_write)
        if keyk not in self._fns:
            body = self._body(self.n_slots, mem_write, update_sensory, pads,
                              masked_write)
            axes = (0,) * 20 + (None,)
            self._fns[keyk] = jax.jit(
                jax.vmap(body, in_axes=axes),
                donate_argnums=self._donation(mem_write, donate),
                **self._jit_kwargs())
        return self._fns[keyk]

    def _block_fn(self, n_read: int, write_last: bool, pads,
                  masked_write: bool = False, end: bool = False):
        keyk = ("block", self.n_slots, n_read, write_last, pads,
                masked_write, end)
        if keyk not in self._fns:
            body = self._block_body(self.n_slots, n_read, write_last, pads,
                                    masked_write, end)
            axes = (0,) * 20 + (None,)
            self._fns[keyk] = jax.jit(
                jax.vmap(body, in_axes=axes),
                donate_argnums=self._donation(write_last, True),
                **self._jit_kwargs())
        return self._fns[keyk]

    # -- stepping ----------------------------------------------------------

    def _reserve(self, extra: int) -> None:
        need = int(self.sizes.max()) + extra
        cap = self.key.shape[2]
        if need > cap:
            grow = _round_up(need, self.hw) - cap
            pad3 = ((0, 0), (0, 0), (0, grow))
            self.key = jnp.pad(self.key, pad3 + ((0, 0),))
            self.shr = jnp.pad(self.shr, pad3)
            self.value = jnp.pad(self.value, pad3 + ((0, 0), (0, 0)))
            if self.use_lt:
                self.sel = jnp.pad(self.sel, pad3 + ((0, 0),))
                self.use_cnt = jnp.pad(self.use_cnt, pad3)
                self.life_cnt = jnp.pad(self.life_cnt, pad3)

    def _shard(self, args):
        """Lay the video axis out over 'data' (no-op once the state is
        already sharded — i.e. every launch after the first, except right
        after a host-side attach/consolidation rebuild)."""
        if self.mesh is None:
            return args
        return tuple(jax.device_put(a, self._shard_video) for a in args)

    def _lt_args(self):
        b = len(self.cores)
        if self.use_lt:
            return (self.sel, self.use_cnt, self.life_cnt, self.lt_key,
                    self.lt_shr, self.lt_value, self.lt_use, self.lt_life,
                    jnp.asarray(self.lt_sizes))
        z = jnp.zeros((b, self.n_slots, 0))
        return (z, z, z, z, z, z, z, z,
                jnp.zeros((b, self.n_slots), jnp.int32))

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
        sel, use, life, ltk, lts, ltv, ltu, ltl, lt_sizes = self._lt_args()
        fn = self._fn(mem_write, update_sensory, pads, donate, masked)
        args = self._shard(
            (frames, do_write, self.num_obj, self.key, self.shr, sel,
             self.value, use, life, ltk, lts, ltv, ltu, ltl,
             jnp.asarray(self.sizes), lt_sizes, self.rowmaps,
             jnp.asarray(self.rowcnt), self.sensory, self.last_mask))
        out = fn(*args, self.variables)
        (probs, self.sensory, last_mask, key, shr, sel, value, use, life,
         lt_use, lt_life) = out
        if keep_last_mask:
            self.last_mask = last_mask
        if self.use_lt:
            self.use_cnt, self.life_cnt = use, life
            if self.count_lt_usage:
                self.lt_use, self.lt_life = lt_use, lt_life
        if mem_write:
            self.key, self.shr, self.value = key, shr, value
            if self.use_lt:
                self.sel = sel
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
        if is_mem.any():
            self._maybe_consolidate()
        return probs

    def plan_block(self, max_k: int) -> int:
        """Largest K <= max_k such that no video's memory write falls before
        the block's LAST frame (writes may only land there — the scanned
        read frames keep the rings loop-invariant)."""
        nxt = self.last_mem_ti + self.cfg.mem_every - self.curr_ti
        return int(max(1, min(int(nxt.min()), max_k)))

    def step_block(self, frames, end: bool = False) -> jnp.ndarray:
        """Advance every video K frames in ONE compiled launch (use
        plan_block to choose K). frames: [B, K, H, W, 3] (list of B
        [K, H, W, 3] accepted). Returns probabilities
        [B, K, 1 + o_cap, H, W]. Per-video write cadences may diverge: a
        write due on the last frame only for some videos runs as a masked
        write, exactly as step_all."""
        frames = jnp.stack([jnp.asarray(f, jnp.float32) for f in frames]) \
            if isinstance(frames, (list, tuple)) else jnp.asarray(frames)
        b, k, h, w = frames.shape[:4]
        for i in range(1, k):
            due = self.curr_ti + i - self.last_mem_ti >= self.cfg.mem_every
            assert not due.any(), \
                "a mid-block frame would be a memory frame; use plan_block"
        self.curr_ti = self.curr_ti + k
        is_mem = ((self.curr_ti - self.last_mem_ti >= self.cfg.mem_every)
                  & (not end))
        write_last = bool(is_mem.any())
        masked = write_last and not is_mem.all()

        pads = pad_amounts(h, w, 16)
        hw = ((h + pads[2] + pads[3]) // 16) * ((w + pads[0] + pads[1]) // 16)
        if write_last:
            self._reserve(hw)
        do_write = jnp.asarray(is_mem) if masked else \
            jnp.ones((b,), bool)
        sel, use, life, ltk, lts, ltv, ltu, ltl, lt_sizes = self._lt_args()
        fn = self._block_fn(k - 1 if write_last else k, write_last, pads,
                            masked, end=end)
        args = self._shard(
            (frames, do_write, self.num_obj, self.key, self.shr, sel,
             self.value, use, life, ltk, lts, ltv, ltu, ltl,
             jnp.asarray(self.sizes), lt_sizes, self.rowmaps,
             jnp.asarray(self.rowcnt), self.sensory, self.last_mask))
        out = fn(*args, self.variables)
        (probs, self.sensory, self.last_mask, key, shr, sel, value, use,
         life, lt_use, lt_life) = out
        if self.use_lt:
            self.use_cnt, self.life_cnt = use, life
            if self.count_lt_usage:
                self.lt_use, self.lt_life = lt_use, lt_life
        if write_last:
            self.key, self.shr, self.value = key, shr, value
            if self.use_lt:
                self.sel = sel
            writers = np.asarray(is_mem)
            self.sizes = self.sizes + hw * (writers[:, None] &
                                            (self.rowcnt > 0))
            self.last_mem_ti = np.where(is_mem, self.curr_ti,
                                        self.last_mem_ti)
            self._maybe_consolidate()
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

    def forward_ids(self, frames) -> np.ndarray:
        """forward_probs with DEVICE-side per-video masked argmax: returns
        id maps [B, H, W] uint8 (ids 0..num_obj[vi], exactly
        np.argmax(forward_probs(frames)[vi][:n+1], 0)). Through the
        tunneled chip this pulls ~36x less than the f32 probability stack
        (3.3 vs 119 MB at 480p/batch 8) — measured at 5.4 s/cycle of
        forward time in the detection bench before this path."""
        probs = self._launch(frames, mem_write=False, update_sensory=True,
                             keep_last_mask=False, donate=False)
        if "argmax_ids" not in self._fns:
            def fn(p, n):
                ok = jnp.arange(p.shape[1])[None, :, None, None] <= \
                    n[:, None, None, None]
                return jnp.argmax(jnp.where(ok, p, -1.0),
                                  axis=1).astype(jnp.uint8)
            self._fns["argmax_ids"] = jax.jit(fn)
        assert self.o_cap < 255
        return np.asarray(self._fns["argmax_ids"](probs, self.num_obj))

    def align_consensus_batched(self, cores: Sequence[InferenceCore],
                                keyframe_selection: str = "first"):
        """Every (video, non-keyframe voting frame) spatial alignment of
        in-clip consensus in ONE vmapped launch, with device-side masked
        argmax readback. Semantics per item match
        InferenceCore.spatial_alignment + np.argmax(proj, 0)
        (reference:deva/inference/consensus_automatic.py:118-135) up to the
        usual padded-channel softmax shift (the shared object pad is the
        batch max). Returns per-video dicts {frame_index: id map [H, W]}
        for vote_in_temporary_buffer(precomputed_proj=...).

        Measured motivation (bench.py --detection phase breakdown, batch 8,
        480p, TPU v5e via the relay): consensus was 67% of steady-state
        cycle time at ~23 s/cycle — 16 sequential alignment launches, each
        synchronously pulling an f32 [1+o, H, W] probability stack (~8 MB)
        through the ~34 MB/s tunnel. One launch + uint8-sized readbacks
        removes 15 round-trips and ~97% of the bytes. Uploads are kept
        small the same way: the one-hot mask stack is built ON DEVICE from
        an int32 id mask + per-item segment-id table (4x fewer bytes at
        o_pad=4, 16x at 16), each video's keyframe image ships once and is
        gathered per item inside the launch, and device-resident images
        (lockstep drivers keep frames on device) are padded/stacked with
        jnp ops so they never round-trip through the host."""
        items = []
        tars = []       # one padded keyframe image per contributing video
        per_video: List[Dict[int, np.ndarray]] = [dict() for _ in cores]
        for vi, c in enumerate(cores):
            frames = c.frame_buffer
            if not frames:
                continue
            if keyframe_selection == "last":
                ki = len(frames) - 1
            elif keyframe_selection == "first":
                ki = 0
            elif keyframe_selection == "middle":
                ki = (len(frames) + 1) // 2
            else:
                raise NotImplementedError(keyframe_selection)
            h, w = frames[0].image.shape[:2]
            lw, uw, lh, uh = pad_amounts(h, w, 16)

            def pad_img(img):
                # jnp.pad keeps device-resident frames on device; a host
                # numpy frame uploads once here
                return jnp.pad(jnp.asarray(img, jnp.float32),
                               ((lh, uh), (lw, uw), (0, 0)))

            tar_idx = None
            for i, f in enumerate(frames):
                if i == ki or not f.segments_info:
                    continue
                if tar_idx is None:
                    tar_idx = len(tars)
                    tars.append(pad_img(frames[ki].image))
                m = np.pad(np.asarray(f.mask, np.int32),
                           ((lh, uh), (lw, uw)))
                seg_ids = [seg.id for seg in f.segments_info]
                items.append((vi, i, pad_img(f.image), tar_idx, m, seg_ids))
        if not items:
            return per_video
        o_pad = self.cfg.pad_objects(max(len(it[5]) for it in items))
        n_obj = jnp.asarray([len(it[5]) for it in items], jnp.int32)
        src = jnp.stack([it[2] for it in items])
        tar_all = jnp.stack(tars)
        tar_idx = jnp.asarray([it[3] for it in items], jnp.int32)
        mask_ids = jnp.asarray(np.stack([it[4] for it in items]))
        # -1 pad never matches (mask ids are >= 0; channel order is the
        # segments_info order find_consensus_auto_association uses)
        seg_tab = jnp.asarray(np.stack(
            [np.asarray(it[5] + [-1] * (o_pad - len(it[5])), np.int32)
             for it in items]))

        keyk = ("align_ids", o_pad, src.shape, tar_all.shape)
        if keyk not in self._fns:
            model = self.model
            cfg = self.cfg

            def body(src_img, mask_ids, seg_ids, n, tar_i, tar_all,
                     variables):
                from deva_tpu.ops import memory_attention as ma
                src_mask = (mask_ids[None] == seg_ids[:, None, None]
                            ).astype(jnp.float32)      # [o_pad, H, W]
                tar_img = tar_all[tar_i]
                src_ms, src_feat = model.apply(
                    variables, src_img[None], method=DEVANetwork.encode_image)
                src_key, src_shr, _ = model.apply(
                    variables, src_feat, method=DEVANetwork.transform_key)
                tar_ms, tar_feat = model.apply(
                    variables, tar_img[None], method=DEVANetwork.encode_image)
                tar_key, _, tar_sel = model.apply(
                    variables, tar_feat, method=DEVANetwork.transform_key)
                _, hq, wq, ck = src_key.shape
                o = src_mask.shape[0]
                cv = model.config.value_dim
                sensory = jnp.zeros((1, o, hq, wq, cv), jnp.float32)
                value, sensory = model.apply(
                    variables, src_img[None], src_ms[0], sensory,
                    src_mask[None], deep_update=True,
                    method=DEVANetwork.encode_mask)
                mk = src_key[0].reshape(hq * wq, ck)
                msr = src_shr[0].reshape(hq * wq)
                qk = tar_key[0].reshape(hq * wq, ck)
                qe = tar_sel[0].reshape(hq * wq, ck)
                values = value[0].reshape(o, hq * wq, cv)
                rd = ma.attend(mk, msr, values, qk, qe, top_k=cfg.top_k,
                               method=cfg.topk_method)
                rd = rd.reshape(1, o, hq, wq, cv)
                selector = (jnp.arange(o) < n).astype(jnp.float32)[None]
                _, _, prob = model.apply(
                    variables, tar_ms, rd, sensory, src_mask[None],
                    selector=selector, update_sensory=False,
                    method=DEVANetwork.segment)
                p = prob[0]  # [1 + o_pad, H, W], padded domain
                ok = jnp.arange(p.shape[0]) <= n
                return jnp.argmax(jnp.where(ok[:, None, None], p, -1.0),
                                  axis=0).astype(jnp.uint8)

            self._fns[keyk] = jax.jit(
                jax.vmap(body, in_axes=(0, 0, 0, 0, 0, None, None)))
        assert o_pad < 255
        ids = np.asarray(self._fns[keyk](src, mask_ids, seg_tab, n_obj,
                                         tar_idx, tar_all, self.variables))
        for k, (vi, i, *_rest) in enumerate(items):
            per_video[vi][i] = ids[k].astype(np.int64)
        return per_video

    # -- long-term consolidation (host-orchestrated, rare) ------------------

    def _maybe_consolidate(self) -> None:
        """Consolidate every (video, slot) whose working ring hit the
        trigger. All writes advance in whole-frame (hw) quanta and the check
        runs after every write, so every triggered pair sits at exactly
        max_work_tokens and the candidate windows stack uniformly. Mirrors
        MemoryEngine.maybe_consolidate/_compress/_evict_obsolete
        (reference:deva/inference/memory_manager.py:207-276,
        kv_memory_store.py:127-185) with the prototype math vmapped over
        triggered pairs."""
        if not self.use_lt:
            return
        cfg = self.cfg
        hw = self.hw
        max_work = cfg.max_mid_term_frames * hw
        min_work = cfg.min_mid_term_frames * hw
        trig = [(vi, si)
                for vi in range(len(self.cores))
                for si in range(self.n_slots)
                if self.rowcnt[vi, si] > 0
                and self.sizes[vi, si] >= max_work
                and self.sizes[vi, si] > min_work + hw]
        if not trig:
            return
        # sizes advance in hw quanta and the check runs after every write,
        # so every pair triggers at the SAME smallest qualifying size: the
        # min-size guard (reference:kv_memory_store.py:134-135) can delay
        # the trigger past max_work when max_work <= min_work + hw
        s_star = max(max_work, (cfg.min_mid_term_frames + 2) * hw)
        sizes = {int(self.sizes[vi, si]) for vi, si in trig}
        assert sizes == {s_star}, \
            f"triggered pairs must sit at {s_star} tokens, got {sizes}"

        # usage-based eviction for pairs whose LT ring is at the cap
        limit = cfg.max_long_term_elements - cfg.num_prototypes
        evict = [(vi, si) for vi, si in trig
                 if self.lt_sizes[vi, si] >= limit]
        if evict:
            # without LT usage counting every token's usage is 0 and the
            # strictly-greater threshold would silently evict the ENTIRE
            # long-term ring (reference:memory_manager.py:211-216 requires
            # counting before eviction is meaningful)
            assert self.count_lt_usage, (
                "long-term memory saturated but enable_long_term_count_usage"
                " is False; enable it (the reference's long-video policy) so"
                " eviction has usage statistics to rank tokens by")
            self._evict_obsolete(evict, limit)

        size = s_star
        start, end = hw, size - min_work + hw
        vis = np.asarray([vi for vi, _ in trig])
        sis = np.asarray([si for _, si in trig])
        usage = self.use_cnt / self.life_cnt
        proto_key, proto_shr, proto_value = jax.vmap(
            lambda k, s, e, v, u: _consolidate_prototypes(
                k, s, e, v, u, num_prototypes=cfg.num_prototypes))(
            self.key[vis, sis, start:end], self.shr[vis, sis, start:end],
            self.sel[vis, sis, start:end], self.value[vis, sis, start:end],
            usage[vis, sis, start:end])

        # sieve the triggered pairs: keep [0:start] + [end:size], in place
        # via a per-pair gather (untouched pairs keep the identity order)
        cap = self.key.shape[2]
        order = np.tile(np.arange(cap), (len(self.cores), self.n_slots, 1))
        sieved = np.concatenate([np.arange(start), np.arange(end, size),
                                 np.arange(size - (end - start), size),
                                 np.arange(size, cap)])
        order[vis, sis] = sieved

        def gather(a):
            idx = jnp.asarray(order, jnp.int32)
            ix = idx.reshape(idx.shape + (1,) * (a.ndim - 3))
            return jnp.take_along_axis(a, ix, axis=2)

        self.key = gather(self.key)
        self.shr = gather(self.shr)
        self.sel = gather(self.sel)
        self.value = gather(self.value)
        self.use_cnt = gather(self.use_cnt)
        self.life_cnt = gather(self.life_cnt)
        new_size = start + (size - end)
        self.sizes[vis, sis] = new_size

        # append prototypes at each pair's LT cursor (growing capacity as
        # the max cursor approaches it — lazy, same policy as
        # MemoryEngine._compress)
        p = proto_key.shape[1]  # == num_prototypes unless window-clamped
        lcap = self.lt_key.shape[2]
        if int(self.lt_sizes[vis, sis].max()) + p > lcap:
            max_cap = _round_up(cfg.max_long_term_elements, p)
            new_cap = min(
                _round_up(max(lcap * 2,
                              int(self.lt_sizes[vis, sis].max()) + p), p),
                max_cap)
            grow = new_cap - lcap
            pad3 = ((0, 0), (0, 0), (0, grow))
            self.lt_key = jnp.pad(self.lt_key, pad3 + ((0, 0),))
            self.lt_shr = jnp.pad(self.lt_shr, pad3)
            self.lt_value = jnp.pad(self.lt_value, pad3 + ((0, 0), (0, 0)))
            self.lt_use = jnp.pad(self.lt_use, pad3)
            self.lt_life = jnp.pad(self.lt_life, pad3)
        for i, (vi, si) in enumerate(trig):
            off = int(self.lt_sizes[vi, si])
            self.lt_key = self.lt_key.at[vi, si, off:off + p].set(
                proto_key[i].astype(self.lt_key.dtype))
            self.lt_shr = self.lt_shr.at[vi, si, off:off + p].set(
                proto_shr[i].astype(self.lt_shr.dtype))
            self.lt_value = self.lt_value.at[vi, si, off:off + p].set(
                proto_value[i].astype(self.lt_value.dtype))
            self.lt_use = self.lt_use.at[vi, si, off:off + p].set(0.0)
            self.lt_life = self.lt_life.at[vi, si, off:off + p].set(1e-7)
            self.lt_sizes[vi, si] += p

    def _evict_obsolete(self, pairs, max_size: int) -> None:
        """Per-(video, slot) usage eviction with the strictly-greater
        threshold semantics of reference:kv_memory_store.py:164-185;
        survivors keep their original order via a stable gather."""
        lcap = self.lt_key.shape[2]
        lt_use = np.asarray(self.lt_use)
        lt_life = np.asarray(self.lt_life)
        order = np.tile(np.arange(lcap), (len(self.cores), self.n_slots, 1))
        for vi, si in pairs:
            n = int(self.lt_sizes[vi, si])
            k = n - max_size
            if k <= 0:
                continue
            usage = lt_use[vi, si, :n] / lt_life[vi, si, :n]
            thresh = np.partition(usage, k - 1)[k - 1]
            survived = usage > thresh
            order[vi, si] = np.concatenate([
                np.nonzero(survived)[0], np.nonzero(~survived)[0],
                np.arange(n, lcap)])
            self.lt_sizes[vi, si] = int(survived.sum())

        def gather(a):
            idx = jnp.asarray(order, jnp.int32)
            ix = idx.reshape(idx.shape + (1,) * (a.ndim - 3))
            return jnp.take_along_axis(a, ix, axis=2)

        self.lt_key = gather(self.lt_key)
        self.lt_shr = gather(self.lt_shr)
        self.lt_value = gather(self.lt_value)
        self.lt_use = gather(self.lt_use)
        self.lt_life = gather(self.lt_life)
