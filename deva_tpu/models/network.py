"""DEVANetwork: the top-level temporal-propagation model.

Behavioral anchor: reference:deva/model/network.py:18-190. Same five
sub-computations, exposed as flax methods instead of a mode-dispatching
forward:
  encode_image   image -> multi-scale features + key features
  transform_key  key features -> (key, shrinkage, selection)
  encode_mask    image + mask (+sensory) -> memory value (+deep-updated sensory)
  read_memory    dense-softmax attention readout (training path; at inference
                 the fixed-shape ring-buffer readout in deva_tpu/inference
                 replaces this, like the reference's MemoryManager)
  segment        memory readout + sensory + last mask -> mask probabilities

Logit aggregation (soft-argmax over objects with product-of-background) and the
final x4 upsample stay in float32 (reference:deva/model/network.py:33-40,
156,167).

All tensors are NHWC; grouped tensors are [B, O, H, W, C]. `selector` masks
padded object slots — at inference the object axis is padded to a bucket size
so steps never retrace (see deva_tpu/inference).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deva_tpu.config import ModelConfig
from deva_tpu.models.blocks import KeyProjection
from deva_tpu.models.decoder import MaskDecoder
from deva_tpu.models.encoders import MaskEncoder, PixelEncoder
from deva_tpu.ops.aggregate import aggregate_logits
from deva_tpu.ops.memory_attention import (full_softmax, get_similarity,
                                           readout)
from deva_tpu.ops.resize import downsample_area, upsample_bilinear


class DEVANetwork(nn.Module):
    config: ModelConfig = ModelConfig()

    def setup(self):
        dtype = self.config.compute_dtype
        self.pixel_encoder = PixelEncoder(self.config.pix_feat_dim, dtype=dtype)
        self.mask_encoder = MaskEncoder(self.config.value_dim,
                                        self.config.value_dim, dtype=dtype)
        self.key_proj = KeyProjection(self.config.key_dim, dtype=dtype)
        self.mask_decoder = MaskDecoder(self.config.value_dim,
                                        self.config.pix_feat_dim, dtype=dtype)

    # ---- sub-computations -------------------------------------------------

    def encode_image(self, image, train: bool = False):
        """image [B,H,W,3] -> ((f16,f8,f4), key_feat [B,h,w,Cp])"""
        return self.pixel_encoder(image, train=train)

    def transform_key(self, feat, need_sk: bool = True, need_ek: bool = True):
        """feat [B,h,w,Cp] -> (key [B,h,w,Ck], shrinkage [B,h,w,1] | None,
        selection [B,h,w,Ck] | None)"""
        return self.key_proj(feat, need_s=need_sk, need_e=need_ek)

    def encode_mask(self, image, pix_f16, sensory, masks,
                    deep_update: bool = True, train: bool = False):
        """-> (value [B,O,h,w,Cv], new_sensory [B,O,h,w,Cs])"""
        return self.mask_encoder(image, pix_f16, sensory, masks,
                                 deep_update=deep_update, train=train)

    def read_memory(self, query_key, query_selection, memory_key,
                    memory_shrinkage, memory_value):
        """Training-time dense attention readout.

        query_key [B,h,w,Ck]; query_selection [B,h,w,Ck]
        memory_key [B,N,Ck]; memory_shrinkage [B,N]; memory_value [B,O,N,Cv]
        -> [B,O,h,w,Cv]
        reference:deva/model/network.py:72-92 (dense softmax, no top-k).
        """
        b, h, w, ck = query_key.shape
        qk = query_key.reshape(b, h * w, ck)
        qe = query_selection.reshape(b, h * w, ck)

        def one(mk, ms, qk1, qe1, mv):
            sim = get_similarity(mk, ms, qk1, qe1)
            aff = full_softmax(sim)
            return readout(aff, mv)  # [O, HW, Cv]

        out = jax.vmap(one)(memory_key, memory_shrinkage, qk, qe, memory_value)
        o, cv = memory_value.shape[1], memory_value.shape[-1]
        return out.reshape(b, o, h, w, cv).astype(self.config.compute_dtype)

    def segment(self,
                multi_scale_features,
                memory_readout,
                sensory,
                last_mask,
                selector: Optional[jnp.ndarray] = None,
                need_aux: bool = False,
                update_sensory: bool = True,
                independent_objects: bool = False):
        """memory_readout/sensory [B,O,h,w,C]; last_mask [B,O,H,W] (full res).

        returns (new_sensory, logits [B,O+1ish...], prob [B,O+1,H,W]) and, with
        need_aux, additionally (aux_logits, aux_prob) — matching
        reference:deva/model/network.py:94-173.
        """
        # area-downsample the last mask to stride 16 and add a channel axis
        b, o = last_mask.shape[:2]
        lm = downsample_area(last_mask[..., None], 16)  # [B,O,h,w,1]
        lm = lm.astype(memory_readout.dtype)

        if need_aux:
            new_sensory, logits, aux_logits = self.mask_decoder(
                multi_scale_features, memory_readout, sensory, lm,
                need_aux=True, update_sensory=update_sensory)
            aux_prob = jax.nn.sigmoid(aux_logits.astype(jnp.float32))
            if selector is not None:
                aux_prob = aux_prob * selector[..., None, None]
            agg_aux = aggregate_logits(aux_prob, axis=1)  # [B,O+1,h,w]
            agg_aux = upsample_bilinear(
                jnp.moveaxis(agg_aux, 1, -1), 16)  # [B,H,W,O+1]
            aux_logits_up = jnp.moveaxis(agg_aux, -1, 1)
            aux_prob_up = jax.nn.softmax(aux_logits_up, axis=1)
        else:
            new_sensory, logits = self.mask_decoder(
                multi_scale_features, memory_readout, sensory, lm,
                need_aux=False, update_sensory=update_sensory)

        prob = jax.nn.sigmoid(logits.astype(jnp.float32))  # [B,O,4h,4w]
        if selector is not None:
            prob = prob * selector[..., None, None]

        if independent_objects:
            # per-object softmax against its own background; used by the
            # consensus spatial alignment (reference:network.py:148-163).
            # assumes batch size 1 like the reference.
            p = prob[0][:, None]  # [O,1,4h,4w]
            lg = aggregate_logits(p, axis=1)  # [O,2,4h,4w]
            lg = jnp.moveaxis(
                upsample_bilinear(jnp.moveaxis(lg, 1, -1), 4), -1, 1)
            pr = jax.nn.softmax(lg, axis=1)  # [O,2,H,W]
            background = pr[:, 0].min(axis=0, keepdims=True)  # [1,H,W]
            prob_out = jnp.concatenate([background, pr[:, 1]], axis=0)[None]
            out_logits, out_prob = lg, prob_out  # logits per-object form
        else:
            lg = aggregate_logits(prob, axis=1)  # [B,O+1,4h,4w]
            lg = jnp.moveaxis(
                upsample_bilinear(jnp.moveaxis(lg, 1, -1), 4), -1, 1)
            out_logits = lg
            out_prob = jax.nn.softmax(lg, axis=1)  # [B,O+1,H,W]

        if need_aux:
            return new_sensory, out_logits, out_prob, aux_logits_up, aux_prob_up
        return new_sensory, out_logits, out_prob

    def __call__(self, image, masks, sensory, train: bool = False):
        """Initialization-only forward used by .init(): touches every submodule
        so a single init call materializes all params."""
        ms, key_feat = self.encode_image(image, train=train)
        key, shrinkage, selection = self.transform_key(key_feat)
        value, sensory2 = self.encode_mask(image, ms[0], sensory, masks,
                                           deep_update=True, train=train)
        b, h, w, ck = key.shape
        o = masks.shape[1]
        mem_k = key.reshape(b, h * w, ck)
        mem_s = shrinkage.reshape(b, h * w)
        mem_v = value.reshape(b, o, h * w, -1)
        rd = self.read_memory(key, selection, mem_k, mem_s, mem_v)
        return self.segment(ms, rd, sensory2, masks, need_aux=True)
