"""TinyViT image encoder (MobileSAM / Light-HQ-SAM) in flax — TPU-native.

Behavioral anchor: reference:deva/ext/MobileSAM/tiny_vit_sam.py:23-676 (the
vendored TinyViT the reference uses as the light SAM image encoder; the same
file is vendored again at reference:deva/ext/LightHQSAM/tiny_vit_sam.py).
Differential parity vs that torch implementation is asserted in
tests/test_tiny_vit.py with converted random-init weights.

Inference-only port (eval mode): DropPath/Dropout are identities, BatchNorm
uses running statistics. Layout is NHWC throughout (TPU-native); the encoder
output is [B, H/16, W/16, 256] where the torch reference returns NCHW.

Architecture (MobileSAM config, reference:deva/ext/MobileSAM/
setup_mobile_sam.py:8-35): PatchEmbed (two stride-2 ConvBN) -> stage 0 of
MBConv blocks -> 3 transformer stages of window attention (learned relative
position biases) + depthwise local conv + MLP, with PatchMerging between
stages (stride 1 into the last stage, so the final grid is H/16 x W/16) ->
a 256-channel SAM neck (1x1 conv, LayerNorm, 3x3 conv, LayerNorm).
"""
from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _gelu(x):
    # torch nn.GELU default is the exact erf form
    return nn.gelu(x, approximate=False)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, eval mode.
    reference:tiny_vit_sam.py:23-31 (Conv2d_BN)."""
    features: int
    kernel: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.pad, self.pad)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    name="c")(x)
        return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            name="bn")(x)


class PatchEmbed(nn.Module):
    """reference:tiny_vit_sam.py:62-79 — two stride-2 3x3 ConvBN (H/4)."""
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.embed_dim // 2, 3, 2, 1, name="conv1")(x)
        x = _gelu(x)
        return ConvBN(self.embed_dim, 3, 2, 1, name="conv2")(x)


class MBConv(nn.Module):
    """reference:tiny_vit_sam.py:82-121."""
    out_chans: int
    expand_ratio: float

    @nn.compact
    def __call__(self, x):
        hidden = int(x.shape[-1] * self.expand_ratio)
        shortcut = x
        x = _gelu(ConvBN(hidden, name="conv1")(x))
        x = _gelu(ConvBN(hidden, 3, 1, 1, groups=hidden, name="conv2")(x))
        x = ConvBN(self.out_chans, name="conv3")(x)
        return _gelu(x + shortcut)


class PatchMerging(nn.Module):
    """reference:tiny_vit_sam.py:124-153. Stride 1 (not 2) into the 320/448/
    576-channel stage — that quirk keeps the final grid at stride 16."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = _gelu(ConvBN(self.out_dim, name="conv1")(x))
        x = _gelu(ConvBN(self.out_dim, 3, stride, 1, groups=self.out_dim,
                         name="conv2")(x))
        return ConvBN(self.out_dim, name="conv3")(x)


def _attention_bias_idxs(resolution: Tuple[int, int]) -> np.ndarray:
    """Static relative-offset index table.
    reference:tiny_vit_sam.py:262-273."""
    points = list(itertools.product(range(resolution[0]),
                                    range(resolution[1])))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


class WindowAttention(nn.Module):
    """Multi-head attention with learned relative position biases over a
    fixed window. reference:tiny_vit_sam.py:234-302."""
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x):  # x [B, N, C], N == prod(resolution)
        b, n, _ = x.shape
        d = int(self.attn_ratio * self.key_dim)
        dh = d * self.num_heads
        nh_kd = self.key_dim * self.num_heads
        idxs, n_offsets = _attention_bias_idxs(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_offsets))

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(dh + 2 * nh_kd, name="qkv")(x)
        qkv = qkv.reshape(b, n, self.num_heads, -1)
        q, k, v = jnp.split(qkv, [self.key_dim, 2 * self.key_dim], axis=3)
        q = q.transpose(0, 2, 1, 3)  # [B, H, N, dk]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (self.key_dim ** -0.5)
        attn = attn + biases[:, idxs]
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, dh)
        return nn.Dense(self.dim, name="proj")(out)


class Mlp(nn.Module):
    """reference:tiny_vit_sam.py:207-231 (LayerNorm inside the MLP)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = _gelu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.out, name="fc2")(x)


class TinyViTBlock(nn.Module):
    """Window attention + depthwise local conv + MLP.
    reference:tiny_vit_sam.py:305-398. Operates on NHWC."""
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    local_conv_size: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        ws = self.window_size
        res = x

        if h == ws and w == ws:
            y = x.reshape(b, h * w, c)
            y = WindowAttention(c, c // self.num_heads, self.num_heads, 1,
                                (ws, ws), name="attn")(y)
            y = y.reshape(b, h, w, c)
        else:
            pad_b = (ws - h % ws) % ws
            pad_r = (ws - w % ws) % ws
            y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            ph, pw = h + pad_b, w + pad_r
            nh, nw = ph // ws, pw // ws
            y = y.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b * nh * nw, ws * ws, c)
            y = WindowAttention(c, c // self.num_heads, self.num_heads, 1,
                                (ws, ws), name="attn")(y)
            y = y.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, ph, pw, c)[:, :h, :w]

        x = res + y
        x = ConvBN(c, self.local_conv_size, 1, self.local_conv_size // 2,
                   groups=c, name="local_conv")(x)
        return x + Mlp(int(c * self.mlp_ratio), c, name="mlp")(x)


class TinyViT(nn.Module):
    """reference:tiny_vit_sam.py:499-676 (forward_features + SAM neck);
    defaults are the MobileSAM 5M config
    (reference:deva/ext/MobileSAM/setup_mobile_sam.py:12-26).
    Input [B, H, W, 3] (H, W multiples of 32); output [B, H/16, W/16, 256]."""
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3

    @nn.compact
    def __call__(self, x, return_interm: bool = False):
        x = PatchEmbed(self.embed_dims[0], name="patch_embed")(x)

        # stage 0: MBConv blocks + merge
        for i in range(self.depths[0]):
            x = MBConv(self.embed_dims[0], self.mbconv_expand_ratio,
                       name=f"layer0_block{i}")(x)
        x = PatchMerging(self.embed_dims[1], name="layer0_downsample")(x)

        # stages 1..3: transformer blocks (+ merge except after the last)
        interm = None
        for li in range(1, len(self.depths)):
            for i in range(self.depths[li]):
                x = TinyViTBlock(self.embed_dims[li], self.num_heads[li],
                                 self.window_sizes[li], self.mlp_ratio,
                                 self.local_conv_size,
                                 name=f"layer{li}_block{i}")(x)
            if li < len(self.depths) - 1:
                x = PatchMerging(self.embed_dims[li + 1],
                                 name=f"layer{li}_downsample")(x)
            if li == 1:
                # Light-HQ-SAM taps the post-stage-1 features ([B, H/16,
                # W/16, embed_dims[2]=160], the MaskDecoderHQ vit_dim) for
                # its multi-scale fusion (reference:tiny_vit_sam.py:607-613)
                interm = x

        # SAM neck: 1x1 conv -> LN -> 3x3 conv -> LN (channelwise LN == the
        # reference's LayerNorm2d, eps 1e-6; reference:tiny_vit_sam.py:484-497,
        # 581-596)
        x = nn.Conv(256, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(x)
        return (x, interm) if return_interm else x


def convert_tiny_vit_statedict(sd) -> dict:
    """Torch TinyViT state_dict -> flax variables for the module above.

    Covers every encoder key; the classifier head (norm_head/head) and the
    non-persistent attention_bias_idxs buffers are skipped — the SAM image
    encoder never executes them (reference:tiny_vit_sam.py:643-661 returns
    the neck output without the head)."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def put_convbn(dst, src):
        put(params, dst + ("c", "kernel"),
            np.asarray(sd[src + ".c.weight"]).transpose(2, 3, 1, 0))
        put(params, dst + ("bn", "scale"), sd[src + ".bn.weight"])
        put(params, dst + ("bn", "bias"), sd[src + ".bn.bias"])
        put(batch_stats, dst + ("bn", "mean"), sd[src + ".bn.running_mean"])
        put(batch_stats, dst + ("bn", "var"), sd[src + ".bn.running_var"])

    def put_dense(dst, src):
        put(params, dst + ("kernel",), np.asarray(sd[src + ".weight"]).T)
        put(params, dst + ("bias",), sd[src + ".bias"])

    def put_ln(dst, src):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])

    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in sd.items()}
    depths = [0, 0, 0, 0]
    for k in sd:
        parts = k.split(".")
        if parts[0] == "layers" and parts[2] == "blocks":
            li, bi = int(parts[1]), int(parts[3])
            depths[li] = max(depths[li], bi + 1)

    put_convbn(("patch_embed", "conv1"), "patch_embed.seq.0")
    put_convbn(("patch_embed", "conv2"), "patch_embed.seq.2")

    for i in range(depths[0]):
        for conv in ("conv1", "conv2", "conv3"):
            put_convbn((f"layer0_block{i}", conv),
                       f"layers.0.blocks.{i}.{conv}")
    for li in range(len(depths)):
        src_ds = f"layers.{li}.downsample"
        if f"{src_ds}.conv1.c.weight" in sd:
            for conv in ("conv1", "conv2", "conv3"):
                put_convbn((f"layer{li}_downsample", conv),
                           f"{src_ds}.{conv}")
    for li in range(1, len(depths)):
        for i in range(depths[li]):
            blk = f"layer{li}_block{i}"
            src = f"layers.{li}.blocks.{i}"
            put_ln((blk, "attn", "norm"), f"{src}.attn.norm")
            put_dense((blk, "attn", "qkv"), f"{src}.attn.qkv")
            put_dense((blk, "attn", "proj"), f"{src}.attn.proj")
            put(params, (blk, "attn", "attention_biases"),
                sd[f"{src}.attn.attention_biases"])
            put_ln((blk, "mlp", "norm"), f"{src}.mlp.norm")
            put_dense((blk, "mlp", "fc1"), f"{src}.mlp.fc1")
            put_dense((blk, "mlp", "fc2"), f"{src}.mlp.fc2")
            put_convbn((blk, "local_conv"), f"{src}.local_conv")

    put(params, ("neck_conv1", "kernel"),
        sd["neck.0.weight"].transpose(2, 3, 1, 0))
    put_ln(("neck_ln1",), "neck.1")
    put(params, ("neck_conv2", "kernel"),
        sd["neck.2.weight"].transpose(2, 3, 1, 0))
    put_ln(("neck_ln2",), "neck.3")
    return {"params": params, "batch_stats": batch_stats}
