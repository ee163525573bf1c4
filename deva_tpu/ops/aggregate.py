"""Soft-aggregation of per-object probabilities into joint logits.

Behavioral anchor: reference:deva/model/network.py:33-40 (`DEVA.aggregate`):
background prob = prod(1 - p_i); concat; clamp to [1e-7, 1-1e-7]; logit
transform. Always computed in float32.
"""
from __future__ import annotations

import jax.numpy as jnp


def aggregate_logits(prob: jnp.ndarray, axis: int) -> jnp.ndarray:
    """prob: per-object probabilities in [0,1]; returns logits with a prepended
    background channel along `axis`."""
    prob = prob.astype(jnp.float32)
    bg = jnp.prod(1.0 - prob, axis=axis, keepdims=True)
    new_prob = jnp.concatenate([bg, prob], axis=axis)
    new_prob = jnp.clip(new_prob, 1e-7, 1 - 1e-7)
    return jnp.log(new_prob / (1.0 - new_prob))
