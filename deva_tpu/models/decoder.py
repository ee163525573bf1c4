"""Mask decoder: memory readout + compressed sensory (+ last mask) fused with
pixel features, two x2 upsampling stages, per-object 1-channel logits, and a
multi-scale GRU update of the sensory memory.

Behavioral anchor: reference:deva/model/big_modules.py:130-212. The final
prediction conv runs in float32 regardless of the compute dtype (reference
disables autocast there, big_modules.py:189-190). The reference's
chunk-by-chunk object loop is replaced by one folded batch (see encoders.py).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deva_tpu.models.blocks import (DecoderFeatureProcessor, GConv2D,
                                    GroupFeatureFusionBlock, LinearPredictor,
                                    MaskUpsampleBlock, SensoryUpdater,
                                    downsample_groups, fold, unfold)


class MaskDecoder(nn.Module):
    val_dim: int = 512
    pix_feat_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self,
                 multi_scale_features,
                 memory_readout: jnp.ndarray,
                 sensory: jnp.ndarray,
                 last_mask: jnp.ndarray,
                 need_aux: bool = False,
                 update_sensory: bool = True):
        """multi_scale_features: (f16 [B,h,w,512], f8, f4)
        memory_readout: [B,O,h,w,Cv]; sensory: [B,O,h,w,Cs]
        last_mask: [B,O,h,w,1] (already area-downsampled to stride 16)
        returns (new_sensory, logits [B,O,4h,4w] [, aux_logits [B,O,h,w]])
        """
        f16, f8, f4 = multi_scale_features

        aux_logits = None
        if need_aux:
            aux_logits = LinearPredictor(self.pix_feat_dim, dtype=self.dtype,
                                         name="sensory_linear_pred")(
                                             f16, sensory)[..., 0]

        skips = DecoderFeatureProcessor((self.val_dim, 256), dtype=self.dtype,
                                        name="decoder_feat_proc")([f8, f4])

        # compute-dtype add (reference amp: the f32 attention readout enters
        # the autocast region here); no-op at f32
        p16 = memory_readout.astype(self.dtype) + GConv2D(
            self.val_dim, 1, dtype=self.dtype, name="sensory_compress")(
            jnp.concatenate([sensory, last_mask], axis=-1))
        p16 = GroupFeatureFusionBlock(self.val_dim, self.val_dim,
                                      dtype=self.dtype, name="fuser")(f16, p16)
        p8 = MaskUpsampleBlock(256, dtype=self.dtype, name="up_16_8")(
            skips[0], p16)
        p4 = MaskUpsampleBlock(256, dtype=self.dtype, name="up_8_4")(
            skips[1], p8)

        folded_p4, bo = fold(p4)
        logits = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=jnp.float32, name="pred")(
                             nn.relu(folded_p4).astype(jnp.float32))
        logits_g = unfold(logits, bo)  # [B,O,4h,4w,1]

        new_sensory = sensory
        if update_sensory:
            # the reference concatenates the logits onto full-res p4 before
            # the updater downsamples (big_modules.py:200-204); area means
            # commute with concat, so downsampling each part first is
            # identical and skips the full-res 257-channel materialization
            p4_with_logit_s16 = jnp.concatenate(
                [downsample_groups(p4, 4),
                 downsample_groups(logits_g.astype(p4.dtype), 4)], axis=-1)
            new_sensory = SensoryUpdater(512, self.val_dim, dtype=self.dtype,
                                         name="sensory_update")(
                                             p16, downsample_groups(p8, 2),
                                             p4_with_logit_s16, sensory)

        logits_out = logits_g[..., 0]  # [B,O,4h,4w]
        if need_aux:
            return new_sensory, logits_out, aux_logits
        return new_sensory, logits_out
