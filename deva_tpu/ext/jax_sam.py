"""JaxMobileSAM: a fully TPU-native light SAM — TinyViT image encoder
(deva_tpu/ext/tiny_vit.py) + SAM prompt-encoder/mask-decoder
(deva_tpu/ext/sam_decoder.py) behind the same pluggable detector protocols
as the HF implementations (deva_tpu/ext/detectors.py):

  masks_for_boxes(image_np, boxes) -> [N, H, W] bool   (text pipeline)
  generate(image_np, positive_points) -> {masks, iou_preds}  (automatic)

This is the TPU-native replacement for the reference's MobileSAM /
Light-HQ-SAM stacks (reference:deva/ext/MobileSAM/setup_mobile_sam.py:8-50,
reference:deva/ext/automatic_sam.py:16-44): the whole mask source runs as
jitted XLA programs on the same chip as the propagation model, instead of a
separate torch network.

Weights: `variables={"encoder": ..., "decoder": ...}` — converted with
tiny_vit.convert_tiny_vit_statedict (any TinyViT state_dict, e.g. the
MobileSAM image encoder) and sam_decoder.convert_sam_decoder_statedict (HF
`SamModel` state_dicts). Falls back to random init for protocol tests.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from deva_tpu.ext.sam_decoder import SamDecoder, SamDecoderConfig
from deva_tpu.ext.tiny_vit import TinyViT

# SAM's pixel statistics (reference:deva/ext/MobileSAM/setup_mobile_sam.py:
# 46-47)
_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class JaxMobileSAM:
    def __init__(self, variables: Optional[Dict] = None, *,
                 points_per_side: int = 32, points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.88, nms_iou: float = 0.7,
                 seed: int = 0, hq: bool = False):
        """hq=True builds the Light-HQ-SAM variant: the decoder grows the HQ
        output token + multi-scale fusion (MaskDecoderHQ, reference:deva/
        ext/LightHQSAM/setup_light_hqsam.py:29-41) and the TinyViT encoder
        also returns its early 160-dim features for the fusion."""
        self.hq = hq
        self.cfg = SamDecoderConfig(hq=hq)
        self.encoder = TinyViT()
        self.decoder = SamDecoder(self.cfg)
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.nms_iou = nms_iou

        if variables is None:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            enc_vars = self.encoder.init(
                k1, jnp.zeros((1, self.cfg.image_size, self.cfg.image_size,
                               3)))
            # trace every prompt path so all params exist (the dense
            # mask-prompt convs are only present in converted checkpoints;
            # DEVA never prompts with masks)
            interm = (dict(intermediate_embeddings=jnp.zeros(
                (1, 64, 64, self.cfg.vit_dim))) if hq else {})
            dec_vars = self.decoder.init(
                k2, jnp.zeros((1, 64, 64, 256)),
                points=jnp.zeros((1, 1, 1, 2)),
                labels=jnp.zeros((1, 1, 1)),
                boxes=jnp.zeros((1, 1, 4)), **interm)
            variables = {"encoder": enc_vars, "decoder": dec_vars}
        self.variables = variables

        self._encode = jax.jit(functools.partial(self.encoder.apply,
                                                 return_interm=hq))
        self._dec_boxes = jax.jit(functools.partial(
            self.decoder.apply, multimask_output=True))
        self._dec_points = jax.jit(functools.partial(
            self.decoder.apply, multimask_output=True))

    @classmethod
    def from_torch_checkpoint(cls, ckpt_path: str, *, hq: bool = False,
                              **kwargs) -> "JaxMobileSAM":
        """Load a RELEASED MobileSAM (`mobile_sam.pt`) or Light-HQ-SAM
        (`sam_hq_vit_tiny.pt`) checkpoint — the original segment_anything
        state_dict layout the reference consumes
        (reference:deva/ext/MobileSAM/setup_mobile_sam.py:28-50,
        reference:deva/ext/LightHQSAM/setup_light_hqsam.py:8-46) — into the
        fully TPU-native stack."""
        import torch

        from deva_tpu.ext.sam_decoder import convert_original_sam_statedict
        from deva_tpu.ext.tiny_vit import convert_tiny_vit_statedict

        sd = torch.load(ckpt_path, map_location="cpu")
        sd = sd.get("model", sd)
        enc_sd = {k[len("image_encoder."):]: v for k, v in sd.items()
                  if k.startswith("image_encoder.")}
        variables = {"encoder": convert_tiny_vit_statedict(enc_sd),
                     "decoder": convert_original_sam_statedict(sd)}
        return cls(variables, hq=hq, **kwargs)

    # -- pre/post-processing --------------------------------------------------

    def _preprocess(self, image_np: np.ndarray):
        """Resize longest side to image_size, normalize, bottom/right-pad to
        a square (segment_anything ResizeLongestSide semantics)."""
        h, w = image_np.shape[:2]
        size = self.cfg.image_size
        scale = size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        img = Image.fromarray(np.asarray(image_np, np.uint8))
        img = np.asarray(img.resize((nw, nh), Image.BILINEAR), np.float32)
        img = (img - _PIXEL_MEAN) / _PIXEL_STD
        img = np.pad(img, ((0, size - nh), (0, size - nw), (0, 0)))
        return jnp.asarray(img)[None], (nh, nw), scale

    def _embed(self, image_np: np.ndarray):
        """-> (embeddings, decoder kwargs, (nh, nw), scale); in hq mode the
        kwargs carry the TinyViT early features for the HQ fusion."""
        x, (nh, nw), scale = self._preprocess(image_np)
        out = self._encode(self.variables["encoder"], x)
        if self.hq:
            emb, interm = out
            return emb, dict(intermediate_embeddings=interm), (nh, nw), scale
        return out, {}, (nh, nw), scale

    def _masks_to_original(self, logits: np.ndarray, nh: int, nw: int,
                           h: int, w: int) -> np.ndarray:
        """[..., 256, 256] logits over the padded square -> [..., h, w]
        (upscale to the square, crop the pad, resize to original)."""
        size = self.cfg.image_size
        logits = jnp.asarray(logits)
        up = jax.image.resize(logits, (*logits.shape[:-2], size, size),
                              method="bilinear")
        frac_h = nh
        frac_w = nw
        up = up[..., :frac_h, :frac_w]
        out = jax.image.resize(up, (*logits.shape[:-2], h, w),
                               method="bilinear")
        return np.asarray(out)

    # -- detector protocols ---------------------------------------------------

    def masks_for_boxes(self, image_np: np.ndarray,
                        boxes: np.ndarray) -> np.ndarray:
        """Best-of-3 masks per (x1, y1, x2, y2) box -> [N, H, W] bool."""
        h, w = image_np.shape[:2]
        if len(boxes) == 0:
            return np.zeros((0, h, w), bool)
        emb, dec_kw, (nh, nw), scale = self._embed(image_np)
        boxes_r = jnp.asarray(np.asarray(boxes, np.float32) * scale)[None]
        masks, ious = self._dec_boxes(self.variables["decoder"], emb,
                                      boxes=boxes_r, **dec_kw)
        masks = np.asarray(masks[0])   # [N, 3, 256, 256]
        ious = np.asarray(ious[0])     # [N, 3]
        best = ious.argmax(-1)
        sel = masks[np.arange(len(best)), best]
        return self._masks_to_original(sel, nh, nw, h, w) > 0.0

    def generate(self, image_np: np.ndarray,
                 positive_points: Optional[np.ndarray] = None) -> Dict:
        """Grid (or supplied normalized) point prompts -> best mask per
        point -> predicted-IoU filter -> mask NMS; the same contract as
        HFAutomaticSAM.generate / the reference's
        SamAutomaticMaskGenerator."""
        from deva_tpu.ext.detectors import _mask_nms
        h, w = image_np.shape[:2]
        if positive_points is None:
            n = self.points_per_side
            offset = 1 / (2 * n)
            side = np.linspace(offset, 1 - offset, n)
            xs, ys = np.meshgrid(side, side)
            pts = np.stack([xs.ravel(), ys.ravel()], -1)
        else:
            pts = np.asarray(positive_points, np.float32)
        if len(pts) == 0:
            return {"masks": np.zeros((0, h, w), np.float32),
                    "iou_preds": np.zeros((0,), np.float32)}
        emb, dec_kw, (nh, nw), scale = self._embed(image_np)
        pts_r = pts * np.array([w, h], np.float32) * scale

        all_masks, all_ious = [], []
        for i in range(0, len(pts_r), self.points_per_batch):
            chunk = pts_r[i:i + self.points_per_batch]
            points = jnp.asarray(chunk, jnp.float32)[None, :, None, :]
            labels = jnp.ones((1, len(chunk), 1), jnp.float32)
            masks, ious = self._dec_points(self.variables["decoder"], emb,
                                           points=points, labels=labels,
                                           **dec_kw)
            masks = np.asarray(masks[0])   # [P, 3, 256, 256]
            ious = np.asarray(ious[0])     # [P, 3]
            best = ious.argmax(-1)
            for pi in range(len(chunk)):
                if ious[pi, best[pi]] >= self.pred_iou_thresh:
                    all_masks.append(masks[pi, best[pi]])
                    all_ious.append(float(ious[pi, best[pi]]))
        if not all_masks:
            return {"masks": np.zeros((0, h, w), np.float32),
                    "iou_preds": np.zeros((0,), np.float32)}
        sel = self._masks_to_original(np.stack(all_masks), nh, nw, h, w)
        masks = (sel > 0.0).astype(np.float32)
        ious = np.asarray(all_ious, np.float32)
        keep = _mask_nms(masks > 0.5, ious, self.nms_iou)
        return {"masks": masks[keep], "iou_preds": ious[keep]}


def load_variables_npz(npz_path: str) -> Dict:
    """Load a JaxMobileSAM variable tree saved by
    scripts/convert_sam_checkpoint.py (slash-joined tree paths)."""
    flat = np.load(npz_path)
    tree: Dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree
