"""Pixel (key) and mask (value) encoders, NHWC.

Behavioral anchors:
  PixelEncoder: reference:deva/model/big_modules.py:23-51 — ResNet-50 trunk to
    stride 16, two 1x1 projections (decoder skip path + key features).
  MaskEncoder: reference:deva/model/big_modules.py:54-127 — ResNet-18 with a
    4th (mask) input channel to stride 16, fused with pixel f16 via a
    GroupFeatureFusionBlock, plus a deep GRU update of the sensory memory.

The reference's chunk-by-chunk object loop (big_modules.py:99-125) is a GPU
memory workaround; on TPU we process all object slots in one folded batch —
results are identical (the loop is a pure batching device).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deva_tpu.models.resnet import resnet18_trunk, resnet50_trunk
from deva_tpu.models.blocks import (GroupFeatureFusionBlock, SensoryDeepUpdater,
                                    distribute_cat, fold, unfold)


class PixelEncoder(nn.Module):
    pix_feat_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image [B,H,W,3] -> ((f16_proj, f8, f4), key_feat)"""
        f4, f8, f16 = resnet50_trunk(self.dtype, name="trunk")(image,
                                                               train=train)
        f16_skip = nn.Conv(self.pix_feat_dim, (1, 1), dtype=self.dtype,
                           name="proj1")(f16)
        key_feat = nn.Conv(self.pix_feat_dim, (1, 1), dtype=self.dtype,
                           name="proj2")(f16)
        return (f16_skip, f8, f4), key_feat


class MaskEncoder(nn.Module):
    value_dim: int = 512
    sensory_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self,
                 image: jnp.ndarray,
                 pix_f16: jnp.ndarray,
                 sensory: jnp.ndarray,
                 masks: jnp.ndarray,
                 deep_update: bool = True,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image [B,H,W,3]; pix_f16 [B,h,w,Cp]; sensory [B,O,h,w,Cs];
        masks [B,O,H,W] in [0,1] -> (value [B,O,h,w,Cv], new_sensory)."""
        g = distribute_cat(image, masks[..., None])  # [B,O,H,W,4]
        folded, bo = fold(g)
        _, _, g16 = resnet18_trunk(self.dtype, name="trunk")(folded,
                                                             train=train)
        g16 = unfold(g16, bo)  # [B,O,h,w,256]
        g16 = GroupFeatureFusionBlock(self.value_dim, self.value_dim,
                                      dtype=self.dtype,
                                      name="fuser")(pix_f16, g16)
        new_sensory = sensory
        if deep_update:
            new_sensory = SensoryDeepUpdater(self.sensory_dim, dtype=self.dtype,
                                             name="sensory_update")(g16, sensory)
        return g16, new_sensory
