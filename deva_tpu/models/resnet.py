"""ResNet-18/50 trunks (stride 16) in flax.linen, NHWC.

Behavioral anchor: reference:deva/model/resnet.py:46-152 (a torchvision-style
ResNet with an optional widened first conv for extra input channels). Only the
stride-16 trunk (conv1 .. layer3) is used by DEVA
(reference:deva/model/big_modules.py:28-36,58-66), so layer4 is not built.

Weights come from the torch->flax converter (deva_tpu/models/convert.py); the
init here only matters for from-scratch training and mirrors the reference's
He-normal fan-out conv init (reference:deva/model/resnet.py:130-136).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                      name="conv2")(out)
        out = bn("bn2")(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetTrunk(nn.Module):
    """conv1 .. layer3 of a ResNet; returns (f4, f8, f16) multi-scale features.

    block: 'basic' (ResNet-18) or 'bottleneck' (ResNet-50)
    layers: blocks per stage, e.g. (2, 2, 2) or (3, 4, 6)
    in_extra_dim: widen conv1 input by this many channels (the mask channel,
    reference:deva/model/resnet.py:118-121).
    """
    block: str
    layers: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))  # 1/4

        feats = []
        inplanes = 64
        for stage, (planes, num_blocks) in enumerate(
                zip((64, 128, 256), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(num_blocks):
                s = stride if i == 0 else 1
                ds = (s != 1) or (inplanes != planes * expansion)
                x = block_cls(planes, stride=s, has_downsample=ds,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(x, train=train)
                inplanes = planes * expansion
            feats.append(x)
        return tuple(feats)  # (f4, f8, f16)


def resnet50_trunk(dtype=jnp.float32, name=None) -> ResNetTrunk:
    return ResNetTrunk(block="bottleneck", layers=(3, 4, 6), dtype=dtype,
                       name=name)


def resnet18_trunk(dtype=jnp.float32, name=None) -> ResNetTrunk:
    return ResNetTrunk(block="basic", layers=(2, 2, 2), dtype=dtype, name=name)
