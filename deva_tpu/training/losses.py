"""Training losses: bootstrapped CE (hard-pixel mining with warmup), dice, and
the stride-16 aux CE.

Behavioral anchor: reference:deva/model/losses.py:9-78. The reference picks
the top-p hardest pixels with a dynamic-k torch.topk; under jit we sort once
(static shape) and average a dynamically-masked prefix — identical result.
The per-sample class slicing (`[:num_objects+1]`) becomes selector masking:
padded object channels get -1e9 logits so they vanish from the softmax.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _masked_ce(logits: jnp.ndarray, cls_gt: jnp.ndarray,
               selector: jnp.ndarray) -> jnp.ndarray:
    """logits [B, C, H, W] (C = 1 + max_obj); cls_gt [B, H, W] int;
    selector [B, max_obj] (1 = real object). Per-pixel CE [B, H, W]."""
    neg = jnp.full_like(logits[:, 1:], -1e9)
    chan_mask = selector[:, :, None, None] > 0
    logits = jnp.concatenate(
        [logits[:, :1], jnp.where(chan_mask, logits[:, 1:], neg)], axis=1)
    logp = jax.nn.log_softmax(logits, axis=1)
    gt = jax.nn.one_hot(cls_gt, logits.shape[1], axis=1, dtype=logp.dtype)
    return -(gt * logp).sum(axis=1)


def bootstrapped_ce(logits: jnp.ndarray, cls_gt: jnp.ndarray,
                    selector: jnp.ndarray, it: jnp.ndarray,
                    start_warm: int, end_warm: int,
                    top_p: float = 0.3):
    """reference:deva/model/losses.py:24-45. Returns (loss, this_p).

    Top-p selection is PER SAMPLE (the reference loops over the batch and
    averages per-sample means), so hard pixels in one clip cannot crowd out
    another clip's gradient.
    """
    b = logits.shape[0]
    raw = _masked_ce(logits, cls_gt, selector).reshape(b, -1)
    n = raw.shape[1]
    this_p = jnp.where(
        it < start_warm, 1.0,
        jnp.where(it > end_warm, top_p,
                  top_p + (1 - top_p) * ((end_warm - it) /
                                         (end_warm - start_warm))))
    k = jnp.floor(n * this_p).astype(jnp.int32)
    sorted_desc = jnp.sort(raw, axis=1)[:, ::-1]
    take = (jnp.arange(n)[None, :] < k).astype(raw.dtype)
    per_sample = (sorted_desc * take).sum(1) / jnp.maximum(take.sum(1), 1.0)
    return per_sample.mean(), this_p


def dice_loss(masks: jnp.ndarray, cls_gt: jnp.ndarray) -> jnp.ndarray:
    """masks [B, max_obj, H, W] probs (no bg); cls_gt [B, H, W].
    reference:deva/model/losses.py:9-20 (padded channels are averaged in,
    contributing ~0, same as the reference)."""
    b, o = masks.shape[:2]
    m = masks.reshape(b, o, -1)
    gt = jax.nn.one_hot(cls_gt.reshape(b, -1), o + 1,
                        axis=1, dtype=m.dtype)[:, 1:]
    numerator = 2 * (m * gt).sum(-1)
    denominator = m.sum(-1) + gt.sum(-1)
    return (1 - (numerator + 1) / (denominator + 1)).mean()


def compute_losses(outputs: Dict, cls_gt_all: jnp.ndarray,
                   selector: jnp.ndarray, it, *, start_warm: int,
                   end_warm: int) -> Dict[str, jnp.ndarray]:
    """outputs: {'logits': [T-1, B, C, H, W], 'masks': [T-1, B, O, H, W],
    'aux_logits': [T-1, B, C, H, W]}; cls_gt_all [B, T, H, W].
    reference:deva/model/losses.py:54-78 (aux weighted 0.1)."""
    losses = {}
    total = 0.0
    p_sum = 0.0
    t_minus_1 = outputs["logits"].shape[0]
    for i in range(t_minus_1):
        ti = i + 1
        cls_gt = cls_gt_all[:, ti]
        ce, p = bootstrapped_ce(outputs["logits"][i], cls_gt, selector, it,
                                start_warm, end_warm)
        aux_raw = _masked_ce(outputs["aux_logits"][i], cls_gt, selector)
        aux = aux_raw.mean()
        dice = dice_loss(outputs["masks"][i], cls_gt)
        losses[f"ce_loss_{ti}"] = ce
        losses[f"aux_loss_{ti}"] = aux
        losses[f"dice_loss_{ti}"] = dice
        p_sum = p_sum + p / t_minus_1
        total = total + ce + 0.1 * aux + dice
    losses["p"] = p_sum
    losses["total_loss"] = total
    return losses
