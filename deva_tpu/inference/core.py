"""InferenceCore: the stateful per-video propagation engine.

Behavioral anchor: reference:deva/inference/inference_core.py:17-290
(DEVAInferenceCore). Host-side orchestration only — every per-pixel computation
runs in a small set of jitted device functions whose shapes are fixed by
(resolution, object-pad bucket), so frame-to-frame steps never retrace.

Key differences from the reference (all semantics-preserving):
  - the object axis is padded to a bucket size; a `selector` mask zeroes the
    padded slots inside `segment` (same mechanism the reference uses for
    padded objects in training, reference:deva/model/network.py:129-146)
  - the memory lives in fixed-capacity rings (see deva_tpu/inference/memory.py)
  - probabilities returned to the caller are sliced back to 1+num_obj channels
"""
from __future__ import annotations

import warnings
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.feature_store import ImageFeatureStore
from deva_tpu.inference.memory import MemoryEngine
from deva_tpu.inference.object_info import ObjectInfo
from deva_tpu.inference.object_manager import ObjectManager
from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops.aggregate import aggregate_logits
from deva_tpu.ops.pad import pad_divide_by, unpad


class InferenceCore:
    def __init__(self,
                 model: DEVANetwork,
                 variables,
                 config: InferenceConfig,
                 *,
                 image_feature_store: Optional[ImageFeatureStore] = None,
                 obj_mesh=None,
                 obj_axis: str = "model"):
        self.model = model
        self.variables = variables
        self.cfg = config
        self.mem_every = config.mem_every

        # object-axis (tensor-parallel) sharding over a device mesh: per-
        # object state is sharded on its O axis and XLA partitions the
        # grouped decoder/mask-encoder/readout across chips (SURVEY §2.8 TP
        # row; deva_tpu/parallel/object_sharding.py). Worthwhile only for
        # large padded object counts (automatic/text mode).
        self._obj_mesh, self._obj_axis = obj_mesh, obj_axis
        if obj_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self.variables = jax.device_put(
                variables, NamedSharding(obj_mesh, PartitionSpec()))

        mc: ModelConfig = model.config
        self._mc = mc

        # jitted model entry points (cached across frames and videos);
        # variables are passed as arguments so weights are device buffers,
        # not trace-time constants
        _enc = jax.jit(lambda v, img: model.apply(
            v, img, method=DEVANetwork.encode_image))
        _tk = jax.jit(lambda v, feat: model.apply(
            v, feat, method=DEVANetwork.transform_key))
        _em = jax.jit(lambda v, img, f16, sensory, masks, deep: model.apply(
            v, img, f16, sensory, masks, deep_update=deep,
            method=DEVANetwork.encode_mask), static_argnums=(5,))
        _sd = jax.jit(
            lambda v, ms, rd, sensory, last_mask, selector, upd: model.apply(
                v, ms, rd, sensory, last_mask, selector=selector,
                update_sensory=upd, method=DEVANetwork.segment),
            static_argnums=(6,))
        self._encode_image = lambda img: _enc(self.variables, img)
        self._transform_key = lambda feat: _tk(self.variables, feat)
        self._encode_mask = lambda *a: _em(self.variables, *a)
        self._segment_decode = lambda *a: _sd(self.variables, *a)

        # one-shot spatial alignment (consensus):
        # reference:deva/inference/consensus_associated.py:16-69
        top_k = config.top_k

        def _align_fn(v, src_img, src_f16, src_key, src_shr, tar_ms, tar_key,
                      tar_sel, src_mask, selector):
            from deva_tpu.ops import memory_attention as ma
            b, hq, wq, ck = src_key.shape
            o = src_mask.shape[1]
            cv = model.config.value_dim
            sensory = jnp.zeros((1, o, hq, wq, cv), jnp.float32)
            value, sensory = model.apply(v, src_img, src_f16, sensory,
                                         src_mask, deep_update=True,
                                         method=DEVANetwork.encode_mask)
            mk = src_key[0].reshape(hq * wq, ck)
            ms = src_shr[0].reshape(hq * wq)
            qk = tar_key[0].reshape(hq * wq, ck)
            qe = tar_sel[0].reshape(hq * wq, ck)
            values = value[0].reshape(o, hq * wq, cv)
            rd = ma.attend(mk, ms, values, qk, qe, top_k=top_k,
                           method=config.topk_method)
            rd = rd.reshape(1, o, hq, wq, cv)
            _, _, prob = model.apply(v, tar_ms, rd, sensory, src_mask,
                                     selector=selector, update_sensory=False,
                                     method=DEVANetwork.segment)
            return prob

        self._align = jax.jit(_align_fn)

        self.curr_ti = -1
        self.last_mem_ti = 0
        self.object_manager = ObjectManager()
        self.memory: Optional[MemoryEngine] = None
        self.o_cap = 0

        if image_feature_store is None:
            self.image_feature_store = ImageFeatureStore(
                self._encode_image, self._transform_key)
        else:
            self.image_feature_store = image_feature_store

        self.last_mask: Optional[jnp.ndarray] = None  # [O_cap, H, W] probs
        self.pad: Tuple[int, int, int, int] = (0, 0, 0, 0)
        self.frame_buffer: List = []  # online/semi-online buffering
        self.next_voting_frame = config.num_voting_frames - 1

        from deva_tpu.inference.fused_step import FusedStepper
        self._fused = FusedStepper(model, config.top_k,
                                   use_pallas=config.resolve_use_pallas(),
                                   topk_method=config.topk_method,
                                   preencode_blocks=config.preencode_blocks)

    # -- object-slot management -------------------------------------------

    def enabled_long_id(self) -> None:
        self.object_manager.use_long_id = True

    @property
    def use_long_id(self) -> bool:
        return self.object_manager.use_long_id

    def _ensure_capacity(self) -> None:
        """(Re)size the padded object axis to hold num_obj slots."""
        need = self.cfg.pad_objects(max(1, self.object_manager.num_obj))
        if self._obj_mesh is not None:
            # object-axis sharding: explicit device_put shardings need the
            # O dim divisible by the 'model' axis size
            from deva_tpu.inference.memory import _round_up
            need = _round_up(need, self._obj_mesh.shape[self._obj_axis])
        if self.memory is None:
            self.memory = MemoryEngine(self.cfg, self._mc.value_dim,
                                       self._mc.key_dim, self._mc.value_dim,
                                       o_cap=need)
            self.o_cap = need
            return
        if need > self.o_cap:
            grow = need - self.o_cap
            self.memory.o_cap = need
            if self.memory.sensory is not None:
                self.memory.sensory = jnp.pad(
                    self.memory.sensory, ((0, grow), (0, 0), (0, 0), (0, 0)))
            if self.last_mask is not None:
                self.last_mask = jnp.pad(self.last_mask,
                                         ((0, grow), (0, 0), (0, 0)))
            self.o_cap = need

    def _place_for_obj_mesh(self, image=None):
        """Object-axis sharding upkeep: re-place per-object state (heals
        host-side rebuilds) and move the incoming frame onto the mesh's
        device set (a host array is fine, but a single-device-committed one
        would clash inside the jitted step). Returns the placed frame."""
        from jax.sharding import NamedSharding, PartitionSpec
        from deva_tpu.parallel.object_sharding import place_object_state
        place_object_state(self)
        if image is None:
            return None
        return jax.device_put(
            image, NamedSharding(self._obj_mesh, PartitionSpec()))

    def _selector(self) -> jnp.ndarray:
        n = self.object_manager.num_obj
        return (jnp.arange(self.o_cap) < n).astype(jnp.float32)[None]

    # -- internals ----------------------------------------------------------

    def _segment(self, key, shrinkage, selection, ms_features,
                 update_sensory: bool = True) -> jnp.ndarray:
        """-> probabilities [1 + O_cap, H, W] (padded channels ~ 0).
        reference:inference_core.py:89-113."""
        if self.memory is None or not self.memory.engaged:
            warnings.warn("Trying to segment without any memory!",
                          RuntimeWarning)
            h, w = key.shape[1] * 16, key.shape[2] * 16
            return jnp.zeros((1, h, w), jnp.float32)

        hq, wq = key.shape[1], key.shape[2]
        qk = key[0].reshape(hq * wq, -1)
        qe = selection[0].reshape(hq * wq, -1)
        obj_rows = {o.id: t - 1
                    for o, t in self.object_manager.obj_to_tmp_id.items()}
        readout = self.memory.match_memory(qk, qe, obj_rows)
        readout = readout.reshape(1, self.o_cap, hq, wq, -1)

        sensory = self.memory.get_sensory()[None]
        last_mask = self.last_mask[None] if self.last_mask is not None else \
            jnp.zeros((1, self.o_cap, hq * 16, wq * 16), jnp.float32)
        new_sensory, _, prob = self._segment_decode(
            ms_features, readout, sensory, last_mask, self._selector(),
            update_sensory)
        if update_sensory:
            self.memory.update_sensory(new_sensory[0])
        return prob[0]

    def _add_memory(self, image, ms_features, prob_no_bg, key, shrinkage,
                    selection, *, is_deep_update: bool = True) -> None:
        """prob_no_bg: [O_cap, H, W]. reference:inference_core.py:55-87."""
        if self.object_manager.num_obj == 0:
            warnings.warn("Empty object mask!", RuntimeWarning)
            return
        hq, wq = key.shape[1], key.shape[2]
        self.memory.initialize_sensory(hq, wq)
        value, sensory = self._encode_mask(
            image, ms_features[0], self.memory.get_sensory()[None],
            prob_no_bg[None], is_deep_update)
        self.memory.add_memory(
            key[0].reshape(hq * wq, -1),
            shrinkage[0].reshape(hq * wq),
            value[0].reshape(self.o_cap, hq * wq, -1),
            self.object_manager.all_obj_ids,
            selection=(selection[0].reshape(hq * wq, -1)
                       if selection is not None else None))
        self.last_mem_ti = self.curr_ti
        if is_deep_update:
            self.memory.update_sensory(sensory[0])

    # -- public API ----------------------------------------------------------

    def step(self,
             image,
             mask=None,
             objects: Optional[List[int]] = None,
             *,
             hard_mask: bool = True,
             end: bool = False,
             image_ti_override: Optional[int] = None,
             delete_buffer: bool = True) -> jnp.ndarray:
        """Propagate one frame.

        image: [H, W, 3] float32, ImageNet-normalized.
        mask: [H, W] int (hard) or [num_objects, H, W] float (soft) or None.
        objects: object ids corresponding to the hard mask values.
        Returns probabilities [1 + num_obj, H, W] (bg first), unpadded.
        reference:inference_core.py:200-290.
        """
        if objects is None and mask is not None:
            assert not hard_mask
            objects = list(range(1, mask.shape[0] + 1))

        if self._obj_mesh is not None:
            image = self._place_for_obj_mesh(image)

        self.curr_ti += 1
        image_ti = self.curr_ti if image_ti_override is None else \
            image_ti_override

        is_mem_frame = ((self.curr_ti - self.last_mem_ti >= self.mem_every)
                        or (mask is not None)) and (not end)

        fused = self._try_fused_step(image, mask, is_mem_frame, end,
                                     image_ti_override, delete_buffer)
        if fused is not None:
            return fused

        image = jnp.asarray(image, jnp.float32)
        image, self.pad = pad_divide_by(image, 16, 0, 1)
        image = image[None]

        need_segment = (mask is None) or (
            self.object_manager.num_obj > 0
            and not self.object_manager.has_all(list(objects or [])))

        ms_features, key, shrinkage, selection = \
            self.image_feature_store.get_features(image_ti, image)

        if self.memory is None:
            self._ensure_capacity()

        pred_prob_with_bg = None
        if need_segment:
            pred_prob_with_bg = self._segment(key, shrinkage, selection,
                                              ms_features,
                                              update_sensory=not end)

        if mask is not None:
            mask = jnp.asarray(mask)
            mask, _ = pad_divide_by(mask, 16, -2, -1)
            pred_prob_with_bg = self._merge_input_mask(
                mask, objects, hard_mask, need_segment, pred_prob_with_bg)

        # keep all padded slots in last_mask (device, fixed shape)
        n = self.object_manager.num_obj
        probs_no_bg = pred_prob_with_bg[1:]
        if probs_no_bg.shape[0] != self.o_cap:
            probs_no_bg = jnp.pad(
                probs_no_bg, ((0, self.o_cap - probs_no_bg.shape[0]),
                              (0, 0), (0, 0)))
        self.last_mask = probs_no_bg

        if is_mem_frame:
            self._add_memory(image, ms_features, self.last_mask, key,
                             shrinkage, selection)

        if delete_buffer:
            self.image_feature_store.delete(image_ti)

        return unpad(pred_prob_with_bg[:n + 1], self.pad, -2, -1)

    def _try_fused_step(self, image, mask, is_mem_frame: bool, end: bool,
                        image_ti_override, delete_buffer: bool):
        """The single-compiled-program fast path for plain propagation frames
        (one bucket, identity row order, no input mask). Returns the sliced
        probabilities or None when the general path must run."""
        if mask is not None or image_ti_override is not None or \
                not delete_buffer:
            return None
        if self.memory is None or not self.memory.engaged or \
                self.last_mask is None:
            return None
        if len(self.memory.buckets) != 1:
            return None
        (bid, bucket), = self.memory.buckets.items()
        if bucket.obj_ids != self.object_manager.all_obj_ids or \
                bucket.o_cap != self.o_cap:
            return None
        lt = self.memory.long_buckets.get(bid)
        if self.memory.long_buckets and lt is None:
            return None

        image = jnp.asarray(image, jnp.float32)
        h, w = image.shape[:2]
        hw_tokens = (-(-h // 16)) * (-(-w // 16))
        if is_mem_frame:
            limit = self.memory.max_work_tokens \
                if self.memory.use_long_term else None
            bucket.ensure_capacity(hw_tokens, hw_tokens, limit=limit)

        prob, new_sensory, new_last_mask = self._fused(
            self.variables, image, self.object_manager.num_obj, bucket, lt,
            self.memory.get_sensory(), self.last_mask,
            mem_write=is_mem_frame, update_sensory=not end,
            work_usage=self.memory.use_long_term,
            count_lt_usage=self.memory.count_long_term_usage)
        self.memory.update_sensory(new_sensory)
        self.last_mask = new_last_mask
        if is_mem_frame:
            self.last_mem_ti = self.curr_ti
            self.memory.maybe_consolidate()
        return prob  # already [1 + num_obj, H, W] (sliced in the launch)

    def step_chunk(self, images, *, end: bool = False):
        """Propagate several maskless frames in ONE compiled launch per
        memory period: the chunk is decomposed into blocks of read-only
        frames plus one trailing memory-write frame, each block a single
        launch of the fused block body (lax.scan whose rings are
        loop-invariant — the carry is only sensory/last_mask, so there are
        no ring copies). Semantically identical to calling step() per frame;
        falls back to that when the fast path is not eligible (multi-bucket,
        pending consolidation mid-chunk, end-of-video sensory freeze on the
        last frame).

        images: list/array of [H, W, 3] frames.
        Returns a list of per-frame probabilities [1 + num_obj, H, W].
        """
        images = list(images)
        if not images:
            return []

        if self._obj_mesh is not None:
            images = [self._place_for_obj_mesh(img) for img in images]

        eligible = (self.memory is not None and self.memory.engaged
                    and self.last_mask is not None
                    and len(self.memory.buckets) == 1)
        if eligible:
            (bid, bucket), = self.memory.buckets.items()
            eligible = (bucket.obj_ids == self.object_manager.all_obj_ids
                        and bucket.o_cap == self.o_cap)
            lt = self.memory.long_buckets.get(bid)
            if self.memory.long_buckets and lt is None:
                eligible = False
        if not eligible:
            out = []
            for i, img in enumerate(images):
                out.append(self.step(img, end=end and i == len(images) - 1))
            return out

        h, w = np.asarray(images[0]).shape[:2]
        hw_tokens = (-(-h // 16)) * (-(-w // 16))
        max_work = self.memory.max_work_tokens \
            if self.memory.use_long_term else None

        out = []
        i = 0
        while i < len(images):
            # plan the longest chunk that (a) fits capacity, (b) ends before
            # a consolidation would trigger, (c) leaves an end-frame for the
            # sensory-freeze path
            writes = []
            size = bucket.size
            last_mem = self.last_mem_ti
            j = i
            while j < len(images):
                ti = self.curr_ti + 1 + (j - i)
                is_end = end and j == len(images) - 1
                if is_end:
                    break
                write = (ti - last_mem) >= self.mem_every
                writes.append(write)
                if write:
                    last_mem = ti
                    size += hw_tokens
                    if max_work is not None and size >= max_work:
                        j += 1
                        break  # consolidation must run before the next frame
                j += 1
            if not writes:
                out.append(self.step(images[i], end=True))
                i += 1
                continue

            k = len(writes)
            n_writes = sum(writes)
            if n_writes:
                bucket.ensure_capacity(n_writes * hw_tokens, hw_tokens,
                                       limit=max_work)
            frames = jnp.stack([jnp.asarray(im, jnp.float32)
                                for im in images[i:i + k]])
            probs, new_sensory, new_last_mask = self._fused.run_chunk(
                self.variables, frames, writes, self.object_manager.num_obj,
                bucket, lt, self.memory.get_sensory(), self.last_mask,
                work_usage=self.memory.use_long_term,
                count_lt_usage=self.memory.count_long_term_usage)
            self.memory.update_sensory(new_sensory)
            self.last_mask = new_last_mask
            self.curr_ti += k
            if n_writes:
                self.last_mem_ti = last_mem
                self.memory.maybe_consolidate()
                lt = self.memory.long_buckets.get(bid)
            n = self.object_manager.num_obj
            for t in range(k):
                out.append(probs[t, :n + 1])
            i += k
        return out

    def _merge_input_mask(self, mask, objects, hard_mask: bool,
                          need_segment: bool, pred_prob_with_bg):
        """Merge a provided (possibly partial) mask with the forward
        prediction. reference:inference_core.py:246-279."""
        tmp_ids, _ = self.object_manager.add_new_objects(list(objects))
        self._ensure_capacity()

        if need_segment:
            pred_prob_no_bg = pred_prob_with_bg[1:]
            if hard_mask:
                claimed = (mask > 0)
            else:
                claimed = (mask.max(axis=0) > 0.5)
            pred_prob_no_bg = jnp.where(claimed[None], 0.0, pred_prob_no_bg)
            if pred_prob_no_bg.shape[0] < self.o_cap:
                pred_prob_no_bg = jnp.pad(
                    pred_prob_no_bg,
                    ((0, self.o_cap - pred_prob_no_bg.shape[0]), (0, 0), (0, 0)))
            rows, layers = [], []
            for mask_id, tmp_id in enumerate(tmp_ids):
                if hard_mask:
                    layers.append((mask == objects[mask_id]).astype(jnp.float32))
                else:
                    layers.append(mask[mask_id].astype(jnp.float32))
                rows.append(tmp_id - 1)
            merged = pred_prob_no_bg.at[jnp.asarray(rows)].set(
                jnp.stack(layers))
        else:
            if hard_mask:
                layers = [(mask == objects[mask_id]).astype(jnp.float32)
                          for mask_id, _ in enumerate(tmp_ids)]
            else:
                layers = [mask[i].astype(jnp.float32)
                          for i in range(len(tmp_ids))]
            merged = jnp.stack(layers)
            if merged.shape[0] < self.o_cap:
                merged = jnp.pad(
                    merged, ((0, self.o_cap - merged.shape[0]), (0, 0), (0, 0)))

        logits = aggregate_logits(merged, axis=0)
        return jax.nn.softmax(logits, axis=0)

    # -- consensus / detection fusion --------------------------------------

    def spatial_alignment(self, src_ti: int, src_image: np.ndarray,
                          src_mask: np.ndarray, tar_ti: int,
                          tar_image: np.ndarray) -> np.ndarray:
        """Project src_mask [O, H, W] (one-hot float) from the src frame onto
        the target frame. Inputs are already padded to /16. Returns
        [1 + O, H, W] probabilities (numpy).
        reference:deva/inference/consensus_associated.py:16-69."""
        o = src_mask.shape[0]
        o_pad = self.cfg.pad_objects(o)
        src_mask = np.asarray(src_mask, np.float32)
        if o_pad > o:
            src_mask = np.pad(src_mask, ((0, o_pad - o), (0, 0), (0, 0)))
        selector = (jnp.arange(o_pad) < o).astype(jnp.float32)[None]

        src_image_j = jnp.asarray(src_image, jnp.float32)[None]
        tar_image_j = jnp.asarray(tar_image, jnp.float32)[None]
        src_ms, src_key, src_shr, _ = self.image_feature_store.get_features(
            src_ti, src_image_j)
        tar_ms, tar_key, _, tar_sel = self.image_feature_store.get_features(
            tar_ti, tar_image_j)
        prob = self._align(self.variables, src_image_j, src_ms[0], src_key,
                           src_shr, tar_ms, tar_key, tar_sel,
                           jnp.asarray(src_mask)[None], selector)
        return np.asarray(prob[0][:o + 1])

    def vote_in_temporary_buffer(self, keyframe_selection: str = "first",
                                 precomputed_proj=None):
        """Run in-clip consensus over the buffered frames.
        reference:deva/inference/inference_core.py:118-129.
        precomputed_proj: optional {frame_index: aligned channel-id map} from
        BatchedDetectionPropagator.align_consensus_batched (one launch for
        the whole batch instead of one per frame here)."""
        from deva_tpu.inference.consensus import \
            find_consensus_auto_association
        return find_consensus_auto_association(
            self.frame_buffer, self, keyframe_selection=keyframe_selection,
            precomputed_proj=precomputed_proj)

    def incorporate_detection(self,
                              image,
                              new_mask: np.ndarray,
                              segments_info: List[ObjectInfo],
                              *,
                              image_ti_override: Optional[int] = None,
                              forward_mask: Optional[np.ndarray] = None,
                              incremental: bool = False) -> jnp.ndarray:
        """Merge an image-level detection mask (real ids) into the propagated
        state. Returns aggregated logits [1 + num_obj, H, W], unpadded.
        reference:deva/inference/inference_core.py:137-198."""
        from deva_tpu.inference.segment_merging import match_and_merge

        if self._obj_mesh is not None:
            image = self._place_for_obj_mesh(image)

        self.curr_ti += 1
        image_ti = self.curr_ti if image_ti_override is None else \
            image_ti_override

        image = jnp.asarray(image, jnp.float32)
        image, self.pad = pad_divide_by(image, 16, 0, 1)
        image = image[None]
        new_mask = np.asarray(new_mask)
        lw, uw, lh, uh = self.pad
        new_mask = np.pad(new_mask, ((lh, uh), (lw, uw)))

        ms_features, key, shrinkage, selection = \
            self.image_feature_store.get_features(image_ti, image)
        if self.memory is None:
            self._ensure_capacity()

        if forward_mask is None:
            if self.memory.engaged:
                prob = self._segment(key, shrinkage, selection, ms_features)
                n = self.object_manager.num_obj
                forward_mask = np.argmax(np.asarray(prob[:n + 1]), axis=0)
            else:
                forward_mask = np.zeros_like(new_mask)
        else:
            # callers supply the forward prediction in UNPADDED image space
            # (e.g. the batched driver's one-launch forward,
            # evaluation/eval_with_detections_batched.py); align it with the
            # padded detection mask
            forward_mask = np.asarray(forward_mask)
            if forward_mask.shape != new_mask.shape:
                forward_mask = np.pad(forward_mask, ((lh, uh), (lw, uw)))

        merged = match_and_merge(forward_mask, new_mask, self.object_manager,
                                 segments_info,
                                 max_num_objects=self.cfg.max_num_objects,
                                 incremental_mode=incremental)

        purged, tmp_keep, obj_keep = \
            self.object_manager.purge_inactive_objects(
                self.cfg.max_missed_detection_count)
        if purged:
            self.memory.purge_except(obj_keep)
            rows = [t - 1 for t in tmp_keep]
            merged = merged[rows]
            if self.memory.sensory is not None:
                keep = jnp.asarray(rows + [0] * (self.o_cap - len(rows)),
                                   jnp.int32)
                mask_rows = (jnp.arange(self.o_cap) <
                             len(rows))[:, None, None, None]
                self.memory.sensory = jnp.where(
                    mask_rows, self.memory.sensory[keep], 0.0)

        self._ensure_capacity()
        n = self.object_manager.num_obj
        padded = np.zeros((self.o_cap, *merged.shape[-2:]), np.float32)
        padded[:merged.shape[0]] = merged
        self.last_mask = jnp.asarray(padded)

        self._add_memory(image, ms_features, self.last_mask, key, shrinkage,
                         selection)
        logits = aggregate_logits(jnp.asarray(merged), axis=0)
        self.image_feature_store.delete(image_ti)
        return unpad(logits, self.pad, -2, -1)

    # -- online/semi-online buffering ---------------------------------------

    def add_to_temporary_buffer(self, frame_info) -> None:
        self.frame_buffer.append(frame_info)

    def clear_buffer(self) -> None:
        for f in self.frame_buffer:
            self.image_feature_store.delete(f.ti)
        self.frame_buffer = []
