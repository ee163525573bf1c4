"""Fixed-shape working + long-term memory engine.

Behavioral anchors:
  reference:deva/inference/memory_manager.py:14-292 (MemoryManager)
  reference:deva/inference/kv_memory_store.py:5-277 (KeyValueMemoryStore)

TPU-first redesign
------------------
The reference grows per-bucket key/value tensors by `torch.cat` every memory
frame and slices them dynamically; on TPU that would retrace/reallocate
constantly. Here every bucket owns *fixed-capacity* rings:

    key        [cap, Ck]       value     [O_cap, cap, Cv]
    shrinkage  [cap]           selection [cap, Ck]
    use_cnt / life_cnt [cap]

with a host-side integer `size` as the single source of truth for validity.
`size` is passed into jitted kernels as a device scalar, so one compiled
readout serves every fill level; appends are dynamic_update_slice at the
cursor. Capacities grow geometrically (in whole-frame token quanta), giving
O(log T) recompiles over a video instead of O(T).

Bucket semantics are preserved exactly: objects first seen in the same frame
share one bucket (one key timeline + one top-k softmax normalization set);
every `add` appends the same frame's tokens to every live bucket
(reference:kv_memory_store.py:96-116 — inference always adds values for all
objects, so all buckets advance together).

Consolidation into long-term memory (usage top-k prototype selection +
potentiation readout, reference:memory_manager.py:231-276) triggers at
size == max_work_tokens, so its shapes are static; eviction of obsolete
long-term tokens compacts with a stable masked argsort
(reference:kv_memory_store.py:164-185).
"""
from __future__ import annotations

import functools
import math
import warnings
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig
from deva_tpu.ops import memory_attention as ma


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


# --------------------------------------------------------------------------
# jitted kernels (shapes static per (cap, O_cap); sizes are device scalars)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _append_tokens(key, shr, sel, use, life, size, new_key, new_shr, new_sel):
    n = new_key.shape[0]
    key = jax.lax.dynamic_update_slice(key, new_key.astype(key.dtype),
                                       (size, 0))
    shr = jax.lax.dynamic_update_slice(shr, new_shr.astype(shr.dtype),
                                       (size,))
    if sel is not None:
        sel = jax.lax.dynamic_update_slice(sel, new_sel.astype(sel.dtype),
                                           (size, 0))
    if use is not None:
        zeros = jnp.zeros((n,), use.dtype)
        use = jax.lax.dynamic_update_slice(use, zeros, (size,))
        life = jax.lax.dynamic_update_slice(life, zeros + 1e-7, (size,))
    return key, shr, sel, use, life


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_values(value, size, new_value):
    # value [cap, O_cap, Cv] (token-major: appends and the readout matmul
    # both want tokens on the leading axis); new_value [n, O_cap, Cv]
    return jax.lax.dynamic_update_slice(value, new_value.astype(value.dtype),
                                        (size, 0, 0))


def _readout_token_major(aff: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """aff [Q, N]; value [N, O, Cv] -> [O, Q, Cv] via one [Q,N]@[N,O*Cv]
    matmul (MXU-shaped; bf16 rings accumulate in f32)."""
    n, o, cv = value.shape
    out = jax.lax.dot(aff.astype(value.dtype), value.reshape(n, o * cv),
                      preferred_element_type=jnp.float32)
    return out.reshape(aff.shape[0], o, cv).transpose(1, 0, 2)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "return_usage", "method"))
def _bucket_attend(key, shr, value, size, qk, qe, top_k, return_usage,
                   method="auto"):
    cap = key.shape[0]
    valid = jnp.arange(cap) < size
    sim = ma.get_similarity(key, shr, qk, qe,
                            precision=ma.similarity_precision(method))
    if return_usage:
        aff, usage = ma.topk_softmax(sim, top_k, valid, return_usage=True,
                                     method=method)
        return _readout_token_major(aff, value), usage
    aff = ma.topk_softmax(sim, top_k, valid, method=method)
    return _readout_token_major(aff, value)


@functools.partial(jax.jit, static_argnames=("top_k", "method"))
def _bucket_attend_with_long(lt_key, lt_shr, lt_value, lt_size,
                             key, shr, value, size, qk, qe, top_k,
                             method="auto"):
    """Attention over [long-term ; working] concatenated rings.
    reference:memory_manager.py:107-134."""
    lcap, cap = lt_key.shape[0], key.shape[0]
    valid = jnp.concatenate([jnp.arange(lcap) < lt_size,
                             jnp.arange(cap) < size])
    sim = ma.get_similarity(jnp.concatenate([lt_key, key], axis=0),
                            jnp.concatenate([lt_shr, shr], axis=0), qk, qe,
                            precision=ma.similarity_precision(method))
    aff, usage = ma.topk_softmax(sim, top_k, valid, return_usage=True,
                                 method=method)
    rd = _readout_token_major(aff, jnp.concatenate([lt_value, value], axis=0))
    return rd, usage[:lcap], usage[lcap:]


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _update_usage(use, life, usage, size):
    cap = use.shape[0]
    valid = jnp.arange(cap) < size
    return use + jnp.where(valid, usage, 0.0), life + jnp.where(valid, 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("num_prototypes",))
def _consolidate_prototypes(cand_key, cand_shr, cand_sel, cand_value,
                            cand_usage, num_prototypes):
    """Select top-usage prototypes and potentiate: full-softmax readout of the
    candidate values at the prototype queries.
    reference:memory_manager.py:251-276. cand_value is token-major [N, O, Cv];
    the returned prototype values are token-major [P, O, Cv].

    P is clamped to the candidate-window size: tiny frames can make
    (T_max - T_min) * hw < num_prototypes, where an unclamped top_k is a
    hard error (the reference's torch.topk fails the same way; clamping is
    strictly more robust and identical whenever the window fits)."""
    num_prototypes = min(num_prototypes, cand_usage.shape[0])
    _, idx = jax.lax.top_k(cand_usage, num_prototypes)
    proto_key = cand_key[idx]              # [P, Ck]
    proto_sel = cand_sel[idx]              # [P, Ck]
    sim = ma.get_similarity(cand_key, cand_shr, proto_key, proto_sel)  # [P, N]
    aff = ma.full_softmax(sim)
    proto_value = _readout_token_major(aff, cand_value).transpose(1, 0, 2)
    proto_shr = ma.readout(aff, cand_shr[None, :, None])[0, :, 0]  # [P]
    return proto_key, proto_shr, proto_value


def _grow(arr: jnp.ndarray, new_cap: int, axis: int) -> jnp.ndarray:
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, new_cap - arr.shape[axis])
    return jnp.pad(arr, pads)


# --------------------------------------------------------------------------
# buckets
# --------------------------------------------------------------------------

class Bucket:
    """One working-memory bucket: a key timeline shared by the objects that
    first appeared together, plus per-object values (rows follow obj_ids)."""

    def __init__(self, obj_ids: List[int], o_cap: int, cap: int, ck: int,
                 cv: int, save_selection: bool, save_usage: bool,
                 dtype=jnp.float32):
        self.obj_ids = list(obj_ids)
        self.o_cap = o_cap
        self.size = 0
        self.key = jnp.zeros((cap, ck), dtype)
        self.shrinkage = jnp.zeros((cap,), dtype)
        self.selection = jnp.zeros((cap, ck), dtype) if save_selection else None
        # token-major: [cap, O_cap, Cv]
        self.value = jnp.zeros((cap, o_cap, cv), dtype)
        self.use_cnt = jnp.zeros((cap,), jnp.float32) if save_usage else None
        self.life_cnt = jnp.zeros((cap,), jnp.float32) if save_usage else None

    @property
    def cap(self) -> int:
        return self.key.shape[0]

    def plan_capacity(self, extra: int, quantum: int,
                       limit: Optional[int] = None) -> int:
        """Target capacity for `ensure_capacity`, without copying arrays
        (used by detach paths that overwrite the rings anyway)."""
        if self.size + extra <= self.cap:
            return self.cap
        new_cap = max(self.cap * 2, _round_up(self.size + extra, quantum))
        new_cap = _round_up(new_cap, quantum)
        if limit is not None:
            # long-term mode: the working set never exceeds max_work_tokens,
            # so don't let geometric growth overshoot it (masked tokens still
            # cost similarity FLOPs).
            new_cap = min(new_cap, max(_round_up(limit, quantum),
                                       self.size + extra))
        return new_cap

    def ensure_capacity(self, extra: int, quantum: int,
                        limit: Optional[int] = None) -> None:
        new_cap = self.plan_capacity(extra, quantum, limit)
        if new_cap == self.cap:
            return
        self.key = _grow(self.key, new_cap, 0)
        self.shrinkage = _grow(self.shrinkage, new_cap, 0)
        if self.selection is not None:
            self.selection = _grow(self.selection, new_cap, 0)
        self.value = _grow(self.value, new_cap, 0)
        if self.use_cnt is not None:
            self.use_cnt = _grow(self.use_cnt, new_cap, 0)
            self.life_cnt = _grow(self.life_cnt, new_cap, 0)

    def keep_objects(self, keep: List[int]) -> None:
        """Drop value columns of objects not in `keep` (order preserved;
        value is token-major [cap, O_cap, Cv])."""
        new_ids = [o for o in self.obj_ids if o in keep]
        if new_ids == self.obj_ids:
            return
        rows = [self.obj_ids.index(o) for o in new_ids]
        idx = jnp.asarray(rows + [0] * (self.o_cap - len(rows)), jnp.int32)
        keep_mask = (jnp.arange(self.o_cap) < len(rows))[None, :, None]
        self.value = jnp.where(keep_mask, self.value[:, idx], 0)
        self.obj_ids = new_ids


class LongTermBucket:
    def __init__(self, obj_ids: List[int], o_cap: int, cap: int, ck: int,
                 cv: int, save_usage: bool, dtype=jnp.float32):
        self.obj_ids = list(obj_ids)
        self.o_cap = o_cap
        self.size = 0
        self.key = jnp.zeros((cap, ck), dtype)
        self.shrinkage = jnp.zeros((cap,), dtype)
        self.value = jnp.zeros((cap, o_cap, cv), dtype)  # token-major
        self.use_cnt = jnp.zeros((cap,), jnp.float32) if save_usage else None
        self.life_cnt = jnp.zeros((cap,), jnp.float32) if save_usage else None

    cap = Bucket.cap
    keep_objects = Bucket.keep_objects


# --------------------------------------------------------------------------
# the engine
# --------------------------------------------------------------------------

class MemoryEngine:
    """Owns sensory / working / long-term memory for one video.

    Object rows everywhere follow host tmp ids (0-based); the object axis is
    padded to `o_cap`.
    """

    def __init__(self, config: InferenceConfig, sensory_dim: int, key_dim: int,
                 value_dim: int, o_cap: int):
        self.cfg = config
        self.sensory_dim = sensory_dim
        self.ck = key_dim
        self.cv = value_dim
        self.o_cap = o_cap
        self.top_k = config.top_k
        self.topk_method = config.topk_method
        self.use_long_term = config.enable_long_term
        self.count_long_term_usage = config.enable_long_term_count_usage
        self.ring_dtype = config.ring_jnp_dtype

        self.hw: Optional[int] = None  # tokens per frame (set on first add)
        self.h = self.w = None
        self.buckets: Dict[int, Bucket] = {}
        self.long_buckets: Dict[int, LongTermBucket] = {}
        self._next_bucket_id = 0
        self.sensory: Optional[jnp.ndarray] = None   # [O_cap, h, w, Cs]
        self.engaged = False

    # -- sensory ----------------------------------------------------------

    def initialize_sensory(self, h: int, w: int) -> None:
        if self.sensory is None:
            self.sensory = jnp.zeros((self.o_cap, h, w, self.sensory_dim),
                                     jnp.float32)

    def clear_sensory_rows(self, rows: List[int]) -> None:
        if self.sensory is not None and rows:
            self.sensory = self.sensory.at[jnp.asarray(rows)].set(0.0)

    def update_sensory(self, sensory: jnp.ndarray) -> None:
        """sensory [O_cap, h, w, Cs] (already in tmp-row order)."""
        self.sensory = sensory

    def get_sensory(self) -> jnp.ndarray:
        return self.sensory

    # -- working/long-term ------------------------------------------------

    @property
    def max_work_tokens(self) -> int:
        return self.cfg.max_mid_term_frames * self.hw

    @property
    def min_work_tokens(self) -> int:
        return self.cfg.min_mid_term_frames * self.hw

    def add_memory(self,
                   key: jnp.ndarray,        # [HW, Ck]
                   shrinkage: jnp.ndarray,  # [HW]
                   value: jnp.ndarray,      # [O_cap, HW, Cv] rows = tmp rows
                   obj_ids: List[int],      # objects in tmp-row order
                   selection: Optional[jnp.ndarray] = None,
                   new_obj_ids: Optional[List[int]] = None) -> None:
        """Append one frame of tokens. Objects in `new_obj_ids` (first-time)
        form a new bucket; all existing buckets receive the same tokens.
        reference:memory_manager.py:171-218 + kv_memory_store.py:35-116."""
        self.engaged = True
        hw = key.shape[0]
        if self.hw is None:
            self.hw = hw

        known = {o for b in self.buckets.values() for o in b.obj_ids}
        if new_obj_ids is None:
            new_obj_ids = [o for o in obj_ids if o not in known]
        if new_obj_ids:
            bid = self._next_bucket_id
            self._next_bucket_id += 1
            o_cap_b = self.cfg.pad_objects(len(new_obj_ids))
            cap0 = _round_up(hw, hw)
            self.buckets[bid] = Bucket(
                new_obj_ids, o_cap_b, cap0, self.ck, self.cv,
                save_selection=self.use_long_term,
                save_usage=self.use_long_term, dtype=self.ring_dtype)

        row_of = {o: i for i, o in enumerate(obj_ids)}
        limit = self.max_work_tokens if self.use_long_term else None
        for bid, b in self.buckets.items():
            b.ensure_capacity(hw, hw, limit=limit)
            rows = [row_of[o] for o in b.obj_ids]
            idx = jnp.asarray(rows + [0] * (b.o_cap - len(rows)), jnp.int32)
            # token-major [HW, o_cap_b, Cv]; padded columns harmless
            vals = value[idx].transpose(1, 0, 2)
            b.key, b.shrinkage, b.selection, b.use_cnt, b.life_cnt = \
                _append_tokens(b.key, b.shrinkage, b.selection, b.use_cnt,
                               b.life_cnt, b.size, key, shrinkage, selection)
            b.value = _append_values(b.value, b.size, vals)
            b.size += hw

        self.maybe_consolidate()

    def maybe_consolidate(self) -> None:
        """Evict obsolete long-term tokens and consolidate any saturated
        working bucket. reference:memory_manager.py:207-218."""
        if not self.use_long_term:
            return
        for bid in list(self.buckets.keys()):
            b = self.buckets[bid]
            if b.size >= self.max_work_tokens:
                lt = self.long_buckets.get(bid)
                if lt is not None and lt.size >= (
                        self.cfg.max_long_term_elements -
                        self.cfg.num_prototypes):
                    self._evict_obsolete(
                        bid, self.cfg.max_long_term_elements -
                        self.cfg.num_prototypes)
                self._compress(bid)

    def _compress(self, bid: int) -> None:
        """Consolidate the middle of the working timeline into prototypes and
        append them to the long-term bucket.
        reference:memory_manager.py:231-276 + kv_memory_store.py:127-159."""
        b = self.buckets[bid]
        hw = self.hw
        start, end = hw, b.size - self.min_work_tokens + hw
        if b.size <= self.min_work_tokens + hw:
            return  # min_size guard (reference:kv_memory_store.py:134-135)

        usage = b.use_cnt / b.life_cnt
        cand = slice(start, end)
        proto_key, proto_shr, proto_value = _consolidate_prototypes(
            b.key[cand], b.shrinkage[cand], b.selection[cand],
            b.value[cand], usage[cand], self.cfg.num_prototypes)

        # sieve: keep [0:start] + [end:size]
        keep_tail = b.size - end
        new_size = start + keep_tail

        def sieve(a, axis):
            head = jax.lax.slice_in_dim(a, 0, start, axis=axis)
            tail = jax.lax.slice_in_dim(a, end, b.size, axis=axis)
            out = jnp.concatenate([head, tail], axis=axis)
            pad = [(0, 0)] * a.ndim
            pad[axis] = (0, a.shape[axis] - out.shape[axis])
            return jnp.pad(out, pad)

        b.key = sieve(b.key, 0)
        b.shrinkage = sieve(b.shrinkage, 0)
        b.selection = sieve(b.selection, 0)
        b.value = sieve(b.value, 0)
        b.use_cnt = sieve(b.use_cnt, 0)
        b.life_cnt = sieve(b.life_cnt, 0)
        b.size = new_size

        lt = self.long_buckets.get(bid)
        p = proto_key.shape[0]  # == num_prototypes unless window-clamped
        if lt is None:
            # allocate LAZILY: every frame's attention pays similarity +
            # readout FLOPs over the full ring capacity (masked slots
            # included), so a max_long_term_elements-sized ring from the
            # first consolidation would waste ~10x FLOPs for most of a
            # video's life. Start small, double as prototypes accumulate
            # (a recompile per doubling — a handful per hour-long video).
            cap = _round_up(4 * p, p)
            lt = LongTermBucket(b.obj_ids, b.o_cap, cap, self.ck, self.cv,
                                save_usage=self.count_long_term_usage,
                                dtype=self.ring_dtype)
            self.long_buckets[bid] = lt
        if lt.size + p > lt.cap:
            max_cap = _round_up(self.cfg.max_long_term_elements, p)
            new_cap = min(_round_up(max(lt.cap * 2, lt.size + p), p), max_cap)
            lt.key = _grow(lt.key, new_cap, 0)
            lt.shrinkage = _grow(lt.shrinkage, new_cap, 0)
            lt.value = _grow(lt.value, new_cap, 0)
            if lt.use_cnt is not None:
                lt.use_cnt = _grow(lt.use_cnt, new_cap, 0)
                lt.life_cnt = _grow(lt.life_cnt, new_cap, 0)
        lt.obj_ids = list(b.obj_ids)
        lt.key, lt.shrinkage, _, lt.use_cnt, lt.life_cnt = _append_tokens(
            lt.key, lt.shrinkage, None, lt.use_cnt, lt.life_cnt, lt.size,
            proto_key, proto_shr, None)
        lt.value = _append_values(lt.value, lt.size, proto_value)
        lt.size += p

    def _evict_obsolete(self, bid: int, max_size: int) -> None:
        """Remove least-used long-term tokens until size <= max_size, keeping
        survivors in original order. reference:kv_memory_store.py:164-185
        (strictly-greater threshold semantics preserved)."""
        lt = self.long_buckets[bid]
        assert lt.use_cnt is not None and lt.life_cnt is not None, (
            "long-term memory saturated but usage counting is off "
            "(enable_long_term_count_usage=False) — eviction needs usage "
            "statistics; the eval drivers enable counting for videos long "
            "enough to saturate (reference:kv_memory_store.py:169 raises "
            "'I did not count usage!' at the same point)")
        usage = np.asarray(lt.use_cnt / lt.life_cnt)[:lt.size]
        k = lt.size - max_size
        if k <= 0:
            return
        thresh = np.partition(usage, k - 1)[k - 1]
        survived = usage > thresh
        n_surv = int(survived.sum())
        order = np.concatenate([np.nonzero(survived)[0],
                                np.nonzero(~survived)[0],
                                np.arange(lt.size, lt.cap)])
        idx = jnp.asarray(order, jnp.int32)
        lt.key = lt.key[idx]
        lt.shrinkage = lt.shrinkage[idx]
        lt.value = lt.value[idx]
        if lt.use_cnt is not None:
            lt.use_cnt = lt.use_cnt[idx]
            lt.life_cnt = lt.life_cnt[idx]
        lt.size = n_surv

    def match_memory(self, qk: jnp.ndarray, qe: jnp.ndarray,
                     obj_rows: Dict[int, int]) -> jnp.ndarray:
        """qk/qe: [HW, Ck]. obj_rows: obj id -> global tmp row.
        Returns readout [O_cap, HW, Cv] (f32), rows in tmp order.
        reference:memory_manager.py:91-169."""
        out = jnp.zeros((self.o_cap, qk.shape[0], self.cv), jnp.float32)
        for bid, b in self.buckets.items():
            lt = self.long_buckets.get(bid)
            if self.use_long_term and lt is not None and lt.size > 0:
                rd, lt_usage, usage = _bucket_attend_with_long(
                    lt.key, lt.shrinkage, lt.value, lt.size,
                    b.key, b.shrinkage, b.value, b.size, qk, qe,
                    top_k=self.top_k, method=self.topk_method)
                b.use_cnt, b.life_cnt = _update_usage(
                    b.use_cnt, b.life_cnt, usage, b.size)
                if self.count_long_term_usage:
                    lt.use_cnt, lt.life_cnt = _update_usage(
                        lt.use_cnt, lt.life_cnt, lt_usage, lt.size)
            elif self.use_long_term:
                rd, usage = _bucket_attend(b.key, b.shrinkage, b.value, b.size,
                                           qk, qe, top_k=self.top_k,
                                           return_usage=True,
                                           method=self.topk_method)
                b.use_cnt, b.life_cnt = _update_usage(
                    b.use_cnt, b.life_cnt, usage, b.size)
            else:
                rd = _bucket_attend(b.key, b.shrinkage, b.value, b.size,
                                    qk, qe, top_k=self.top_k,
                                    return_usage=False,
                                    method=self.topk_method)
            rows = [obj_rows[o] for o in b.obj_ids]
            out = out.at[jnp.asarray(rows, jnp.int32)].set(
                rd[:len(rows)].astype(jnp.float32))
        return out

    def purge_except(self, keep_obj_ids: List[int]) -> None:
        """reference:memory_manager.py:220-229 + kv_memory_store.py:216-239."""
        keep = set(keep_obj_ids)
        for store in (self.buckets, self.long_buckets):
            dead = []
            for bid, b in store.items():
                b.keep_objects(keep)
                if not b.obj_ids:
                    dead.append(bid)
            for bid in dead:
                del store[bid]
        if not self.buckets:
            self.engaged = False

    @property
    def num_work_tokens(self) -> int:
        return max((b.size for b in self.buckets.values()), default=0)
