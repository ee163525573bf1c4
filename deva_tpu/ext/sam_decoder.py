"""SAM prompt encoder + mask decoder in flax — the TPU-native counterpart of
the `segment_anything` decoder the reference drives through its SAM variants
(reference:deva/ext/grounding_dino.py:41-73 builds Sam(prompt_encoder=...,
mask_decoder=TwoWayTransformer...); reference:deva/ext/MobileSAM/
setup_mobile_sam.py:28-48 pairs the same decoder with the TinyViT encoder).

Paired with deva_tpu.ext.tiny_vit.TinyViT this forms a complete JAX
MobileSAM: image [B, H, W, 3] -> embeddings [B, 64, 64, 256] -> box/point
prompts -> mask logits at 1/4 resolution + predicted IoUs.

Differential parity is asserted against `transformers.SamModel` built from
config (random init, no weight downloads) in tests/test_sam_decoder.py; the
HF implementation is a faithful port of the original decoder, so the
converter (convert_sam_decoder_statedict) also accepts the released
checkpoints' prompt_encoder/mask_decoder keys once available.

Inference-only, NHWC image embeddings, f32.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SamDecoderConfig:
    hidden_size: int = 256
    num_heads: int = 8
    num_layers: int = 2
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    image_size: int = 1024
    image_embedding_size: int = 64
    mask_input_channels: int = 16
    num_pos_feats: int = 128
    layer_norm_eps: float = 1e-6
    # Light-HQ-SAM (reference:deva/ext/LightHQSAM/setup_light_hqsam.py:29-41):
    # an extra HQ output token whose mask is predicted from the upscaled
    # embedding refined with early (vit_dim) + final vision features.
    hq: bool = False
    vit_dim: int = 160

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


def _embedding(name, n, c):
    return nn.Embed(n, c, name=name)


def _row0(embed):
    # flax Embed with num_embeddings=1 rejects scalar indices; fetch row 0
    return embed(jnp.zeros((1,), jnp.int32))[0]


class _Attention(nn.Module):
    """Downscaled multi-head attention (SamAttention)."""
    hidden: int
    heads: int
    downsample: int

    @nn.compact
    def __call__(self, q, k, v):  # [B, N, C]
        internal = self.hidden // self.downsample
        d = internal // self.heads
        b = q.shape[0]

        def heads(x):
            return x.reshape(b, x.shape[1], self.heads, d).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(internal, name="q_proj")(q))
        k = heads(nn.Dense(internal, name="k_proj")(k))
        v = heads(nn.Dense(internal, name="v_proj")(v))
        attn = (q @ k.transpose(0, 1, 3, 2)) * (d ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, -1, internal)
        return nn.Dense(self.hidden, name="out_proj")(out)


class _MLPBlock(nn.Module):
    hidden: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Dense(self.mlp_dim, name="lin1")(x))
        return nn.Dense(self.hidden, name="lin2")(x)


class _TwoWayBlock(nn.Module):
    cfg: SamDecoderConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        eps = c.layer_norm_eps
        if self.skip_first_layer_pe:
            queries = _Attention(c.hidden_size, c.num_heads, 1,
                                 name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _Attention(c.hidden_size, c.num_heads, 1,
                                           name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=eps, name="layer_norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _Attention(
            c.hidden_size, c.num_heads, c.attention_downsample_rate,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=eps, name="layer_norm2")(queries)

        queries = queries + _MLPBlock(c.hidden_size, c.mlp_dim,
                                      name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=eps, name="layer_norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _Attention(
            c.hidden_size, c.num_heads, c.attention_downsample_rate,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=eps, name="layer_norm4")(keys)
        return queries, keys


class _TwoWayTransformer(nn.Module):
    cfg: SamDecoderConfig

    @nn.compact
    def __call__(self, point_embeddings, image_embeddings, image_pe):
        # image_embeddings/image_pe: [B, N_img, C] tokens
        queries, keys = point_embeddings, image_embeddings
        for i in range(self.cfg.num_layers):
            queries, keys = _TwoWayBlock(self.cfg, skip_first_layer_pe=(i == 0),
                                         name=f"layer{i}")(
                queries, keys, point_embeddings, image_pe)
        q = queries + point_embeddings
        k = keys + image_pe
        queries = queries + _Attention(
            self.cfg.hidden_size, self.cfg.num_heads,
            self.cfg.attention_downsample_rate,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-6,
                               name="layer_norm_final_attn")(queries)
        return queries, keys


class _FeedForward(nn.Module):
    hidden: int
    out: int
    depth: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Dense(self.hidden, name="proj_in")(x))
        for i in range(self.depth - 2):
            x = jax.nn.relu(nn.Dense(self.hidden, name=f"layer{i}")(x))
        x = nn.Dense(self.out, name="proj_out")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


def _conv_transpose_2x2(x, kernel, bias):
    """Exact torch ConvTranspose2d(k=2, s=2): each input pixel expands to a
    2x2 output block. x [B, H, W, I]; kernel [I, O, 2, 2] (torch layout)."""
    y = jnp.einsum("bhwi,iopq->bhpwqo", x, kernel)
    b, h, p, w, q, o = y.shape
    return y.reshape(b, h * p, w * q, o) + bias


class SamDecoder(nn.Module):
    """Positional embedding + prompt encoder + two-way mask decoder.

    __call__(image_embeddings [B, 64, 64, 256] NHWC,
             points [B, P, Np, 2] / labels [B, P, Np] and/or
             boxes [B, P, 4], mask_input [B, 1, H/4, W/4] or None)
      -> (mask logits [B, P, num_out, 256, 256], iou_pred [B, P, num_out])
    """
    cfg: SamDecoderConfig = SamDecoderConfig()

    def setup(self):
        c = self.cfg
        self.positional_embedding = self.param(
            "positional_embedding",
            lambda key, shape: (c.hidden_size // 2) *
            jax.random.normal(key, shape), (2, c.num_pos_feats))
        self.point_embed = [_embedding(f"point_embed{i}", 1, c.hidden_size)
                            for i in range(4)]
        self.not_a_point_embed = _embedding("not_a_point_embed", 1,
                                            c.hidden_size)
        self.no_mask_embed = _embedding("no_mask_embed", 1, c.hidden_size)
        self.iou_token = _embedding("iou_token", 1, c.hidden_size)
        self.mask_tokens = _embedding("mask_tokens", c.num_mask_tokens,
                                      c.hidden_size)
        self.transformer = _TwoWayTransformer(c, name="transformer")
        self.iou_head = _FeedForward(c.iou_head_hidden_dim, c.num_mask_tokens,
                                     c.iou_head_depth, name="iou_head")
        self.hyper_mlps = [
            _FeedForward(c.hidden_size, c.hidden_size // 8, 3,
                         name=f"hyper_mlp{i}")
            for i in range(c.num_mask_tokens)]
        self.upscale_kernel1 = self.param(
            "upscale_kernel1", nn.initializers.lecun_normal(),
            (c.hidden_size, c.hidden_size // 4, 2, 2))
        self.upscale_bias1 = self.param(
            "upscale_bias1", nn.initializers.zeros, (c.hidden_size // 4,))
        self.upscale_kernel2 = self.param(
            "upscale_kernel2", nn.initializers.lecun_normal(),
            (c.hidden_size // 4, c.hidden_size // 8, 2, 2))
        self.upscale_bias2 = self.param(
            "upscale_bias2", nn.initializers.zeros, (c.hidden_size // 8,))
        self.upscale_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       name="upscale_ln")
        # mask-input embedding convs (dense prompts)
        mic = c.mask_input_channels
        self.mask_conv1 = nn.Conv(mic // 4, (2, 2), strides=(2, 2),
                                  padding="VALID", name="mask_conv1")
        self.mask_conv2 = nn.Conv(mic, (2, 2), strides=(2, 2),
                                  padding="VALID", name="mask_conv2")
        self.mask_conv3 = nn.Conv(c.hidden_size, (1, 1), name="mask_conv3")
        self.mask_ln1 = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                     name="mask_ln1")
        self.mask_ln2 = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                     name="mask_ln2")

        if c.hq:
            ch = c.hidden_size
            self.hq_token = _embedding("hq_token", 1, ch)
            self.hq_mask_mlp = _FeedForward(ch, ch // 8, 3,
                                            name="hq_mask_mlp")
            # compress_vit: early TinyViT features [.., vit_dim] -> C/8 @ 4x
            self.compress_vit_kernel1 = self.param(
                "compress_vit_kernel1", nn.initializers.lecun_normal(),
                (c.vit_dim, ch, 2, 2))
            self.compress_vit_bias1 = self.param(
                "compress_vit_bias1", nn.initializers.zeros, (ch,))
            self.compress_vit_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                                name="compress_vit_ln")
            self.compress_vit_kernel2 = self.param(
                "compress_vit_kernel2", nn.initializers.lecun_normal(),
                (ch, ch // 8, 2, 2))
            self.compress_vit_bias2 = self.param(
                "compress_vit_bias2", nn.initializers.zeros, (ch // 8,))
            # embedding encoder: final image embeddings -> C/8 @ 4x
            self.encoder_kernel1 = self.param(
                "encoder_kernel1", nn.initializers.lecun_normal(),
                (ch, ch // 4, 2, 2))
            self.encoder_bias1 = self.param(
                "encoder_bias1", nn.initializers.zeros, (ch // 4,))
            self.encoder_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           name="encoder_ln")
            self.encoder_kernel2 = self.param(
                "encoder_kernel2", nn.initializers.lecun_normal(),
                (ch // 4, ch // 8, 2, 2))
            self.encoder_bias2 = self.param(
                "encoder_bias2", nn.initializers.zeros, (ch // 8,))
            # embedding_maskfeature: refine the upscaled SAM embedding
            self.maskfeat_conv1 = nn.Conv(ch // 4, (3, 3),
                                          padding=[(1, 1), (1, 1)],
                                          name="maskfeat_conv1")
            self.maskfeat_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                            name="maskfeat_ln")
            self.maskfeat_conv2 = nn.Conv(ch // 8, (3, 3),
                                          padding=[(1, 1), (1, 1)],
                                          name="maskfeat_conv2")

    # -- positional encodings ------------------------------------------------

    def _pe(self, coords):
        """coords in [0, 1], [..., 2] -> [..., hidden]."""
        coords = 2.0 * coords - 1.0
        coords = (2.0 * math.pi) * (coords @ self.positional_embedding)
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def image_pe(self):
        """Image-wide positional grid [1, S, S, C]."""
        s = self.cfg.image_embedding_size
        y = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        x = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
        return self._pe(grid)[None]

    # -- prompt embedding -----------------------------------------------------

    def _embed_points(self, points, labels, pad):
        c = self.cfg
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((*points.shape[:2], 1, 2))], axis=2)
            labels = jnp.concatenate(
                [labels, -jnp.ones((*labels.shape[:2], 1))], axis=2)
        pe = self._pe(points / c.image_size)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, _row0(self.not_a_point_embed), pe)
        pe = jnp.where(lab == -10, 0.0, pe)
        pe = jnp.where(lab == 0, pe + _row0(self.point_embed[0]), pe)
        pe = jnp.where(lab == 1, pe + _row0(self.point_embed[1]), pe)
        return pe

    def _embed_boxes(self, boxes):
        c = self.cfg
        corners = (boxes.reshape(*boxes.shape[:2], 2, 2) + 0.5) / c.image_size
        pe = self._pe(corners)
        pe = pe.at[:, :, 0].add(_row0(self.point_embed[2]))
        pe = pe.at[:, :, 1].add(_row0(self.point_embed[3]))
        return pe

    def _embed_mask(self, mask):  # [B, H, W, 1] NHWC
        x = self.mask_conv1(mask)
        x = jax.nn.gelu(self.mask_ln1(x), approximate=False)
        x = self.mask_conv2(x)
        x = jax.nn.gelu(self.mask_ln2(x), approximate=False)
        return self.mask_conv3(x)

    # -- the decoder ----------------------------------------------------------

    def __call__(self, image_embeddings, points=None, labels=None,
                 boxes=None, mask_input=None, multimask_output=True,
                 intermediate_embeddings=None, hq_token_only=False):
        c = self.cfg
        b, s, _, ch = image_embeddings.shape

        sparse = None
        if points is not None:
            sparse = self._embed_points(points, labels, pad=(boxes is None))
        if boxes is not None:
            be = self._embed_boxes(boxes)
            sparse = be if sparse is None else \
                jnp.concatenate([sparse, be], axis=2)
        assert sparse is not None, "points and/or boxes required"
        p = sparse.shape[1]  # point batch (prompts per image)

        if mask_input is not None:
            dense = self._embed_mask(mask_input)  # [B, S, S, C]
        else:
            dense = _row0(self.no_mask_embed)
            dense = jnp.broadcast_to(dense[None, None, None], (b, s, s, ch))

        out_tokens = jnp.concatenate(
            [self.iou_token(jnp.zeros((1,), jnp.int32)),
             self.mask_tokens(jnp.arange(c.num_mask_tokens))] +
            ([_row0(self.hq_token)[None]] if c.hq else []), axis=0)
        n_tok = c.num_mask_tokens + (1 if c.hq else 0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None, None],
                              (b, p, *out_tokens.shape)), sparse], axis=2)

        img = (image_embeddings + dense)  # [B, S, S, C]
        img_tokens = img.reshape(b, 1, s * s, ch)
        img_tokens = jnp.broadcast_to(img_tokens, (b, p, s * s, ch))
        pe_tokens = self.image_pe().reshape(1, 1, s * s, ch)
        pe_tokens = jnp.broadcast_to(pe_tokens, (b, p, s * s, ch))

        # fold (B, P) into the transformer batch
        def fold(x):
            return x.reshape(b * p, *x.shape[2:])

        queries, keys = self.transformer(fold(tokens), fold(img_tokens),
                                         fold(pe_tokens))
        iou_token_out = queries[:, 0]
        mask_tokens_out = queries[:, 1:1 + n_tok]

        up = keys.reshape(b * p, s, s, ch)
        up = _conv_transpose_2x2(up, self.upscale_kernel1, self.upscale_bias1)
        up = jax.nn.gelu(self.upscale_ln(up), approximate=False)
        up = _conv_transpose_2x2(up, self.upscale_kernel2, self.upscale_bias2)
        up = jax.nn.gelu(up, approximate=False)  # [BP, 4S, 4S, C/8]

        hyper = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i])
             for i in range(c.num_mask_tokens)] +
            ([self.hq_mask_mlp(mask_tokens_out[:, c.num_mask_tokens])]
             if c.hq else []), axis=1)  # [BP, M(+1), C/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper[:, :c.num_mask_tokens], up)
        masks = masks.reshape(b, p, c.num_mask_tokens, 4 * s, 4 * s)
        iou_pred = self.iou_head(iou_token_out).reshape(b, p,
                                                        c.num_mask_tokens)

        if not c.hq:
            sl = slice(1, None) if multimask_output else slice(0, 1)
            return masks[:, :, sl], iou_pred[:, :, sl]

        # ---- HQ path: refine the upscaled embedding with multi-scale
        # vision features and predict the HQ mask from the hq token
        # (reference:deva/ext/LightHQSAM/setup_light_hqsam.py:29-41; math
        # mirrors transformers.SamHQMaskDecoder, the differential oracle
        # in tests/test_sam_decoder.py) ------------------------------------
        hq_feat = _conv_transpose_2x2(image_embeddings, self.encoder_kernel1,
                                      self.encoder_bias1)
        hq_feat = jax.nn.gelu(self.encoder_ln(hq_feat), approximate=False)
        hq_feat = _conv_transpose_2x2(hq_feat, self.encoder_kernel2,
                                      self.encoder_bias2)  # [B, 4S, 4S, C/8]
        if intermediate_embeddings is not None:
            vit = _conv_transpose_2x2(intermediate_embeddings,
                                      self.compress_vit_kernel1,
                                      self.compress_vit_bias1)
            vit = jax.nn.gelu(self.compress_vit_ln(vit), approximate=False)
            vit = _conv_transpose_2x2(vit, self.compress_vit_kernel2,
                                      self.compress_vit_bias2)
            hq_feat = hq_feat + vit

        up_hq = self.maskfeat_conv1(up)
        up_hq = jax.nn.gelu(self.maskfeat_ln(up_hq), approximate=False)
        up_hq = self.maskfeat_conv2(up_hq)  # [BP, 4S, 4S, C/8]
        # hq features are per-image; repeat over the prompt axis
        hq_feat = jnp.repeat(hq_feat, p, axis=0)
        up_hq = up_hq + hq_feat

        mask_hq = jnp.einsum("bmc,bhwc->bmhw", hyper[:, c.num_mask_tokens:],
                             up_hq)
        mask_hq = mask_hq.reshape(b, p, 1, 4 * s, 4 * s)

        if multimask_output:
            # the 3 multimask SAM channels, best-IoU first (like the HF
            # SamHQ decoder; segment_with_text then takes channel 0)
            iou_mm = iou_pred[:, :, 1:c.num_mask_tokens]
            order = jnp.argsort(-iou_mm, axis=-1)
            masks_sam = jnp.take_along_axis(
                masks[:, :, 1:c.num_mask_tokens],
                order[..., None, None], axis=2)
            iou_out = jnp.take_along_axis(iou_mm, order, axis=-1)
        else:
            masks_sam = masks[:, :, 0:1]
            iou_out = iou_pred[:, :, 0:1]
        out = mask_hq if hq_token_only else masks_sam + mask_hq
        return out, iou_out


# --------------------------------------------------------------------------
# converter: HF transformers SamModel state_dict -> flax variables
# --------------------------------------------------------------------------

def convert_sam_decoder_statedict(sd) -> dict:
    """Maps `transformers.SamModel` prompt_encoder/mask_decoder/
    shared_image_embedding keys (the HF port of the original SAM decoder —
    the same weights the reference loads through `segment_anything`) onto
    the SamDecoder module above. Vision-encoder keys are ignored (the image
    encoder is pluggable: deva_tpu.ext.tiny_vit for MobileSAM)."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in sd.items()}
    p: dict = {}

    def put(path, v):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def dense(dst, src):
        put(dst + ("kernel",), sd[src + ".weight"].T)
        put(dst + ("bias",), sd[src + ".bias"])

    def ln(dst, src):
        put(dst + ("scale",), sd[src + ".weight"])
        put(dst + ("bias",), sd[src + ".bias"])

    def conv(dst, src):
        put(dst + ("kernel",), sd[src + ".weight"].transpose(2, 3, 1, 0))
        put(dst + ("bias",), sd[src + ".bias"])

    def embed(dst, src):
        put(dst + ("embedding",), sd[src + ".weight"])

    put(("positional_embedding",),
        sd["shared_image_embedding.positional_embedding"])
    for i in range(4):
        embed((f"point_embed{i}",), f"prompt_encoder.point_embed.{i}")
    embed(("not_a_point_embed",), "prompt_encoder.not_a_point_embed")
    embed(("no_mask_embed",), "prompt_encoder.no_mask_embed")
    conv(("mask_conv1",), "prompt_encoder.mask_embed.conv1")
    conv(("mask_conv2",), "prompt_encoder.mask_embed.conv2")
    conv(("mask_conv3",), "prompt_encoder.mask_embed.conv3")
    ln(("mask_ln1",), "prompt_encoder.mask_embed.layer_norm1")
    ln(("mask_ln2",), "prompt_encoder.mask_embed.layer_norm2")

    md = "mask_decoder"
    embed(("iou_token",), f"{md}.iou_token")
    embed(("mask_tokens",), f"{md}.mask_tokens")
    n_layers = 1 + max(int(k.split(".")[3])
                       for k in sd if k.startswith(f"{md}.transformer.layers."))
    for i in range(n_layers):
        src = f"{md}.transformer.layers.{i}"
        dst = ("transformer", f"layer{i}")
        for attn in ("self_attn", "cross_attn_token_to_image",
                     "cross_attn_image_to_token"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                dense(dst + (attn, proj), f"{src}.{attn}.{proj}")
        for j in range(1, 5):
            ln(dst + (f"layer_norm{j}",), f"{src}.layer_norm{j}")
        dense(dst + ("mlp", "lin1"), f"{src}.mlp.lin1")
        dense(dst + ("mlp", "lin2"), f"{src}.mlp.lin2")
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        dense(("transformer", "final_attn_token_to_image", proj),
              f"{md}.transformer.final_attn_token_to_image.{proj}")
    ln(("transformer", "layer_norm_final_attn"),
       f"{md}.transformer.layer_norm_final_attn")

    put(("upscale_kernel1",), sd[f"{md}.upscale_conv1.weight"])
    put(("upscale_bias1",), sd[f"{md}.upscale_conv1.bias"])
    put(("upscale_kernel2",), sd[f"{md}.upscale_conv2.weight"])
    put(("upscale_bias2",), sd[f"{md}.upscale_conv2.bias"])
    ln(("upscale_ln",), f"{md}.upscale_layer_norm")

    n_mask_tokens = sd[f"{md}.mask_tokens.weight"].shape[0]
    for i in range(n_mask_tokens):
        src = f"{md}.output_hypernetworks_mlps.{i}"
        dense((f"hyper_mlp{i}", "proj_in"), f"{src}.proj_in")
        dense((f"hyper_mlp{i}", "proj_out"), f"{src}.proj_out")
        # depth-3 FFN has a single middle layer at .layers.0
        if f"{src}.layers.0.weight" in sd:
            dense((f"hyper_mlp{i}", "layer0"), f"{src}.layers.0")
    dense(("iou_head", "proj_in"), f"{md}.iou_prediction_head.proj_in")
    dense(("iou_head", "proj_out"), f"{md}.iou_prediction_head.proj_out")
    j = 0
    while f"{md}.iou_prediction_head.layers.{j}.weight" in sd:
        dense(("iou_head", f"layer{j}"),
              f"{md}.iou_prediction_head.layers.{j}")
        j += 1

    if f"{md}.hq_token.weight" in sd:  # SamHQ checkpoints (Light-HQ-SAM)
        embed(("hq_token",), f"{md}.hq_token")
        dense(("hq_mask_mlp", "proj_in"), f"{md}.hq_mask_mlp.proj_in")
        dense(("hq_mask_mlp", "layer0"), f"{md}.hq_mask_mlp.layers.0")
        dense(("hq_mask_mlp", "proj_out"), f"{md}.hq_mask_mlp.proj_out")
        # ConvTranspose2d weights are (in, out, kh, kw) — the layout
        # _conv_transpose_2x2 consumes directly
        for dst, src in [("compress_vit", "compress_vit_conv"),
                         ("encoder", "encoder_conv")]:
            put((f"{dst}_kernel1",), sd[f"{md}.{src}1.weight"])
            put((f"{dst}_bias1",), sd[f"{md}.{src}1.bias"])
            put((f"{dst}_kernel2",), sd[f"{md}.{src}2.weight"])
            put((f"{dst}_bias2",), sd[f"{md}.{src}2.bias"])
        ln(("compress_vit_ln",), f"{md}.compress_vit_norm")
        ln(("encoder_ln",), f"{md}.encoder_norm")
        conv(("maskfeat_conv1",), f"{md}.mask_conv1")
        conv(("maskfeat_conv2",), f"{md}.mask_conv2")
        ln(("maskfeat_ln",), f"{md}.mask_norm")

    return {"params": p}


# --------------------------------------------------------------------------
# converter: ORIGINAL segment_anything / sam-hq state_dicts
# --------------------------------------------------------------------------

def convert_original_sam_statedict(sd) -> dict:
    """Maps an ORIGINAL `segment_anything`-style Sam state_dict — the layout
    of the released MobileSAM (`mobile_sam.pt`) and Light-HQ-SAM
    (`sam_hq_vit_tiny.pt`) checkpoints the reference loads through
    `setup_mobile_sam`/`setup_light_hqsam`
    (reference:deva/ext/MobileSAM/setup_mobile_sam.py:28-50,
    reference:deva/ext/LightHQSAM/setup_light_hqsam.py:8-46) — onto the
    SamDecoder module, by renaming to the HF-transformers layout and
    delegating to convert_sam_decoder_statedict. Image-encoder keys are
    ignored (convert them with tiny_vit.convert_tiny_vit_statedict).

    Key coverage against the flax variable tree is asserted in
    tests/test_sam_decoder.py; the original names themselves come from the
    (long-stable) segment_anything / sam-hq module structure.
    """
    sd = {k: getattr(v, "numpy", lambda v=v: v)() for k, v in sd.items()}
    out = {}

    def seq(prefix_src, names_dst):
        """nn.Sequential index -> named module (conv/norm/conv...)."""
        for idx, dst in names_dst:
            for leaf in ("weight", "bias"):
                k = f"{prefix_src}.{idx}.{leaf}"
                if k in sd:
                    out[f"{dst}.{leaf}"] = sd[k]

    def mlp(prefix_src, prefix_dst, depth=3):
        """original MLP(layers.0..n-1) -> HF FeedForward
        (proj_in / layers.0.. / proj_out)."""
        for j in range(depth):
            dst = ("proj_in" if j == 0 else
                   "proj_out" if j == depth - 1 else f"layers.{j - 1}")
            for leaf in ("weight", "bias"):
                k = f"{prefix_src}.layers.{j}.{leaf}"
                if k in sd:
                    out[f"{prefix_dst}.{dst}.{leaf}"] = sd[k]

    pe = "prompt_encoder"
    out["shared_image_embedding.positional_embedding"] = \
        sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"]
    for i in range(4):
        out[f"{pe}.point_embed.{i}.weight"] = \
            sd[f"{pe}.point_embeddings.{i}.weight"]
    out[f"{pe}.not_a_point_embed.weight"] = sd[f"{pe}.not_a_point_embed.weight"]
    out[f"{pe}.no_mask_embed.weight"] = sd[f"{pe}.no_mask_embed.weight"]
    seq(f"{pe}.mask_downscaling",
        [(0, f"{pe}.mask_embed.conv1"), (1, f"{pe}.mask_embed.layer_norm1"),
         (3, f"{pe}.mask_embed.conv2"), (4, f"{pe}.mask_embed.layer_norm2"),
         (6, f"{pe}.mask_embed.conv3")])

    md = "mask_decoder"
    for tok in ("iou_token", "mask_tokens"):
        out[f"{md}.{tok}.weight"] = sd[f"{md}.{tok}.weight"]
    li = 0
    while f"{md}.transformer.layers.{li}.self_attn.q_proj.weight" in sd:
        src = f"{md}.transformer.layers.{li}"
        dst = src
        for attn in ("self_attn", "cross_attn_token_to_image",
                     "cross_attn_image_to_token"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                for leaf in ("weight", "bias"):
                    out[f"{dst}.{attn}.{proj}.{leaf}"] = \
                        sd[f"{src}.{attn}.{proj}.{leaf}"]
        for j in range(1, 5):
            for leaf in ("weight", "bias"):
                out[f"{dst}.layer_norm{j}.{leaf}"] = \
                    sd[f"{src}.norm{j}.{leaf}"]
        for lin in ("lin1", "lin2"):
            for leaf in ("weight", "bias"):
                out[f"{dst}.mlp.{lin}.{leaf}"] = sd[f"{src}.mlp.{lin}.{leaf}"]
        li += 1
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        for leaf in ("weight", "bias"):
            out[f"{md}.transformer.final_attn_token_to_image.{proj}.{leaf}"] \
                = sd[f"{md}.transformer.final_attn_token_to_image."
                     f"{proj}.{leaf}"]
    for leaf in ("weight", "bias"):
        out[f"{md}.transformer.layer_norm_final_attn.{leaf}"] = \
            sd[f"{md}.transformer.norm_final_attn.{leaf}"]

    seq(f"{md}.output_upscaling",
        [(0, f"{md}.upscale_conv1"), (1, f"{md}.upscale_layer_norm"),
         (3, f"{md}.upscale_conv2")])
    i = 0
    while f"{md}.output_hypernetworks_mlps.{i}.layers.0.weight" in sd:
        mlp(f"{md}.output_hypernetworks_mlps.{i}",
            f"{md}.output_hypernetworks_mlps.{i}")
        i += 1
    mlp(f"{md}.iou_prediction_head", f"{md}.iou_prediction_head")

    if f"{md}.hf_token.weight" in sd:  # sam-hq (Light-HQ-SAM)
        out[f"{md}.hq_token.weight"] = sd[f"{md}.hf_token.weight"]
        mlp(f"{md}.hf_mlp", f"{md}.hq_mask_mlp")
        seq(f"{md}.compress_vit_feat",
            [(0, f"{md}.compress_vit_conv1"), (1, f"{md}.compress_vit_norm"),
             (3, f"{md}.compress_vit_conv2")])
        seq(f"{md}.embedding_encoder",
            [(0, f"{md}.encoder_conv1"), (1, f"{md}.encoder_norm"),
             (3, f"{md}.encoder_conv2")])
        seq(f"{md}.embedding_maskfeature",
            [(0, f"{md}.mask_conv1"), (1, f"{md}.mask_norm"),
             (3, f"{md}.mask_conv2")])

    return convert_sam_decoder_statedict(out)
