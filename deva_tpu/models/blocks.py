"""Low-level network blocks, NHWC / object-grouped.

Grouped ("g") tensors carry a per-object axis: [B, O, H, W, C]. Convolutions
fold O into the batch axis — on TPU this keeps convs large and batched on the
MXU; all blocks are permutation-equivariant over O (same property the reference
notes at reference:deva/model/group_modules.py:6-7).

Behavioral anchors:
  reference:deva/model/group_modules.py:17-151 (GConv2D, GroupResBlock,
    MainToGroupDistributor, GroupFeatureFusionBlock, up/downsample_groups)
  reference:deva/model/modules.py:22-169 (KeyProjection, MaskUpsampleBlock,
    DecoderFeatureProcessor, LinearPredictor, SensoryUpdater,
    SensoryDeepUpdater)
  reference:deva/model/cbam.py:7-77 (CBAM)
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from deva_tpu.ops.resize import downsample_area, upsample_bilinear


def fold(g):
    """[B, O, ...] -> [B*O, ...]"""
    b, o = g.shape[:2]
    return g.reshape((b * o,) + g.shape[2:]), (b, o)


def unfold(x, bo):
    b, o = bo
    return x.reshape((b, o) + x.shape[1:])


def distribute_cat(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Broadcast frame features x [B,H,W,C] over objects and concat with
    g [B,O,H,W,Cg] on channels (x first).
    reference:deva/model/group_modules.py:105-120 (method='cat')."""
    o = g.shape[1]
    x = jnp.broadcast_to(x[:, None], (x.shape[0], o) + x.shape[1:])
    return jnp.concatenate([x, g], axis=-1)


def distribute_add(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """reference:deva/model/group_modules.py:121-122 (method='add')."""
    return x[:, None] + g


def upsample_groups(g: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    folded, bo = fold(g)
    return unfold(upsample_bilinear(folded, ratio), bo)


def downsample_groups(g: jnp.ndarray, inv_ratio: int = 2) -> jnp.ndarray:
    folded, bo = fold(g)
    return unfold(downsample_area(folded, inv_ratio), bo)


class GConv2D(nn.Module):
    """Conv over grouped tensors (object axis folded into batch).
    reference:deva/model/group_modules.py:41-45."""
    features: int
    kernel_size: int = 1
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, g):
        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        folded, bo = fold(g)
        out = nn.Conv(self.features, (k, k), padding=pad, dtype=self.dtype,
                      kernel_init=self.kernel_init, name="conv")(folded)
        return unfold(out, bo)


class GroupResBlock(nn.Module):
    """Pre-activation residual block over grouped tensors with a 1x1
    projection shortcut when channels change.
    reference:deva/model/group_modules.py:48-67."""
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g):
        # Cast at entry: without this, `out + folded` below promotes back to
        # f32 whenever the block input is f32, and the promotion compounds —
        # every downstream residual/upsample runs double-width. The reference
        # under torch.autocast keeps these adds in fp16 (autocast wraps the
        # whole decoder, reference:deva/model/network.py:33-40), so compute-
        # dtype residuals are the faithful amp semantics. No-op at f32.
        g = g.astype(self.dtype)
        in_dim = g.shape[-1]
        folded, bo = fold(g)
        out = nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="conv1")(nn.relu(folded))
        out = nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="conv2")(nn.relu(out))
        if in_dim != self.out_dim:
            folded = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                             name="downsample")(folded)
        return unfold(out + folded, bo)


class CBAM(nn.Module):
    """Convolutional block attention: channel gate (avg+max pooled shared MLP)
    then 7x7 spatial gate. Operates on folded [N,H,W,C].
    reference:deva/model/cbam.py:21-77."""
    gate_channels: int
    reduction_ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.gate_channels
        mlp_in = nn.Dense(c // self.reduction_ratio, dtype=self.dtype,
                          name="mlp_fc1")
        mlp_out = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")
        avg = x.mean(axis=(1, 2))
        mx = x.max(axis=(1, 2))
        att = mlp_out(nn.relu(mlp_in(avg))) + mlp_out(nn.relu(mlp_in(mx)))
        x = x * nn.sigmoid(att)[:, None, None, :]

        compress = jnp.concatenate(
            [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)],
            axis=-1)
        gate = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), dtype=self.dtype,
                       name="spatial")(compress)
        return x * nn.sigmoid(gate)


class _SlicedConv(nn.Module):
    """A conv whose kernel is declared at the full concatenated input width
    but applied to channel SLICES of it — the machinery behind
    _SharedCatResBlock. Parameter names/shapes/init are identical to
    nn.Conv(features, (k, k)) on the concatenated input ('kernel'/'bias',
    lecun_normal/zeros), so checkpoints and the torch converter are
    unaffected."""
    features: int
    in_features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lo: int, hi: int, bias: bool):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        out = lax.conv_general_dilated(
            x.astype(self.dtype), kernel[:, :, lo:hi, :].astype(self.dtype),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias:
            out = out + b.astype(self.dtype)
        return out


class _SharedCatResBlock(nn.Module):
    """GroupResBlock over cat([x broadcast over O, g]) WITHOUT materializing
    the concat or recomputing the x half per object. A conv over
    concatenated channels is the sum of convs over the parts, and
    relu(cat(x, g)) = cat(relu(x), relu(g)), so conv1 and the projection
    shortcut split into an x-slice (computed ONCE per frame, broadcast over
    objects) and a g-slice (per object). Parameters are bit-identical to
    GroupResBlock(distribute_cat(x, g)) — same paths (conv1/conv2/
    downsample), same shapes, same init — only the compute schedule
    changes; outputs differ from the fused conv by float summation order
    only. This is the many-object attack on the decoder/mask-encoder
    fusers: the frame-feature half of conv1 (3x3 Cx->mid, ~7.6 GFLOP at
    480p serving shape) no longer scales with object count."""
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, g):
        x = x.astype(self.dtype)
        g = g.astype(self.dtype)
        cx, cg = x.shape[-1], g.shape[-1]
        in_dim = cx + cg
        assert in_dim != self.out_dim, \
            "identity shortcut would need the materialized concat"
        conv1 = _SlicedConv(self.out_dim, in_dim, 3, dtype=self.dtype,
                            name="conv1")
        down = _SlicedConv(self.out_dim, in_dim, 1, dtype=self.dtype,
                           name="downsample")

        # once per frame: the object-invariant halves
        shared1 = conv1(nn.relu(x), 0, cx, bias=False)      # [B,h,w,mid]
        shared_s = down(x, 0, cx, bias=False)

        folded, bo = fold(g)
        out = conv1(nn.relu(folded), cx, in_dim, bias=True)
        out = unfold(out, bo) + shared1[:, None]
        out, _ = fold(out)
        out = nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="conv2")(nn.relu(out))
        short = down(folded, cx, in_dim, bias=True)
        short = unfold(short, bo) + shared_s[:, None]
        return unfold(out, bo) + short


class GroupFeatureFusionBlock(nn.Module):
    """Fuse frame features with per-object features: cat-distribute ->
    GroupResBlock -> CBAM residual -> GroupResBlock.
    reference:deva/model/group_modules.py:133-151. block1 runs in the
    decomposed _SharedCatResBlock form (identical parameters and math up to
    float summation order; the frame-feature half computes once per frame
    instead of per object)."""
    mid_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, g):
        g = _SharedCatResBlock(self.mid_dim, dtype=self.dtype,
                               name="block1")(x, g)
        folded, bo = fold(g)
        r = CBAM(self.mid_dim, dtype=self.dtype, name="attention")(folded)
        g = g + unfold(r, bo)
        return GroupResBlock(self.out_dim, dtype=self.dtype, name="block2")(g)


class KeyProjection(nn.Module):
    """Key / shrinkage / selection projections from pixel features.
    shrinkage = d_proj(x)^2 + 1 (per-token scale >= 1);
    selection = sigmoid(e_proj(x)) (per-channel query gate).
    reference:deva/model/modules.py:60-78."""
    key_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, need_s: bool = True, need_e: bool = True):
        key = nn.Conv(self.key_dim, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype,
                      kernel_init=nn.initializers.orthogonal(),
                      bias_init=nn.initializers.zeros, name="key_proj")(x)
        shrinkage = None
        selection = None
        if need_s:
            d = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name="d_proj")(x)
            shrinkage = d * d + 1.0
        if need_e:
            e = nn.Conv(self.key_dim, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="e_proj")(x)
            selection = nn.sigmoid(e)
        return key, shrinkage, selection


class MaskUpsampleBlock(nn.Module):
    """x2 bilinear upsample of grouped features + skip add + GroupResBlock.
    reference:deva/model/modules.py:81-92."""
    out_dim: int
    scale_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip_f, up_g):
        # Compute-dtype upsample: the x2 stencil + interleave chain is pure
        # HBM traffic (see docs/PERFORMANCE.md), so running it at f32 doubles
        # its bytes; torch.autocast would run F.interpolate in fp16 here.
        g = upsample_groups(up_g.astype(self.dtype), ratio=self.scale_factor)
        g = distribute_add(skip_f.astype(self.dtype), g)
        return GroupResBlock(self.out_dim, dtype=self.dtype, name="out_conv")(g)


class DecoderFeatureProcessor(nn.Module):
    """1x1 projections of the skip features. reference:deva/model/modules.py:95-104."""
    out_dims: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, multi_scale_features) -> List[jnp.ndarray]:
        return [
            nn.Conv(d, (1, 1), dtype=self.dtype, name=f"transform_{i}")(x)
            for i, (x, d) in enumerate(zip(multi_scale_features, self.out_dims))
        ]


class LinearPredictor(nn.Module):
    """Aux linear mask predictor: per-object dynamic linear classifier over
    frame features. reference:deva/model/modules.py:107-118."""
    pred_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im_feat, pred_feat):
        # im_feat [B,h,w,Cp]; pred_feat [B,O,h,w,Cv]
        params = GConv2D(self.pred_dim + 1, 1, dtype=self.dtype,
                         name="projection")(pred_feat)  # [B,O,h,w,Cp+1]
        x = jnp.sum(im_feat[:, None] * params[..., :-1], axis=-1,
                    keepdims=True) + params[..., -1:]
        return x  # [B,O,h,w,1]


def _gru_update(values: jnp.ndarray, h: jnp.ndarray, sensory_dim: int):
    """DEVA's nonstandard GRU: new value is generated before the forget gate
    (reference:deva/model/modules.py:141-151)."""
    forget_gate = nn.sigmoid(values[..., :sensory_dim])
    update_gate = nn.sigmoid(values[..., sensory_dim:sensory_dim * 2])
    new_value = jnp.tanh(values[..., sensory_dim * 2:])
    return forget_gate * h * (1.0 - update_gate) + update_gate * new_value


class SensoryUpdater(nn.Module):
    """Decoder-side multi-scale GRU update of the sensory memory.
    reference:deva/model/modules.py:121-151.

    Takes all three scales ALREADY area-downsampled to stride 16 (the caller
    downsamples; the reference downsamples inside, modules.py:130-133 —
    channelwise area means commute with everything between, so results are
    identical; hoisting lets the decoder downsample p4 and the 1-channel
    logits separately instead of materializing a full-resolution 257-channel
    concat, which cost a large relayout copy in the serving block)."""
    mid_dim: int
    sensory_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g16, g8, g4, h):
        g = (GConv2D(self.mid_dim, 1, dtype=self.dtype, name="g16_conv")(g16) +
             GConv2D(self.mid_dim, 1, dtype=self.dtype, name="g8_conv")(g8) +
             GConv2D(self.mid_dim, 1, dtype=self.dtype, name="g4_conv")(g4))
        g = jnp.concatenate([g, h], axis=-1)
        values = GConv2D(self.sensory_dim * 3, 3, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_normal(),
                         name="transform")(g)
        return _gru_update(values, h, self.sensory_dim)


class SensoryDeepUpdater(nn.Module):
    """Mask-encoder-side GRU update of the sensory memory.
    reference:deva/model/modules.py:154-169."""
    sensory_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, h):
        values = GConv2D(self.sensory_dim * 3, 3, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_normal(),
                         name="transform")(jnp.concatenate([f, h], axis=-1))
        return _gru_update(values, h, self.sensory_dim)
