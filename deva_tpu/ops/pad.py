"""Center-pad spatial dims to a multiple of d, and undo it.

Behavioral anchor: reference:deva/utils/tensor_utils.py:7-48. The reference is
channel-first and pads the last two dims; deva_tpu is channel-last (NHWC), so
these helpers take explicit height/width axis positions.

These run on host (numpy) or inside jit (jax.numpy); shapes are static.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pad_amounts(h: int, w: int, d: int) -> Tuple[int, int, int, int]:
    """(left_w, right_w, top_h, bottom_h), reference pad_array ordering."""
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh = (new_h - h) // 2
    uh = (new_h - h) - lh
    lw = (new_w - w) // 2
    uw = (new_w - w) - lw
    return (lw, uw, lh, uh)


def pad_divide_by(x: jnp.ndarray, d: int, h_axis: int, w_axis: int):
    """Pad axes (h_axis, w_axis) of x up to multiples of d with zeros, centered.

    Returns (padded, pad) with pad = (lw, uw, lh, uh) like the reference.
    """
    h, w = x.shape[h_axis], x.shape[w_axis]
    lw, uw, lh, uh = pad_amounts(h, w, d)
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (lh, uh)
    pads[w_axis] = (lw, uw)
    return jnp.pad(x, pads), (lw, uw, lh, uh)


def unpad(x: jnp.ndarray, pad: Tuple[int, int, int, int], h_axis: int, w_axis: int):
    lw, uw, lh, uh = pad
    idx = [slice(None)] * x.ndim
    if lh + uh > 0:
        idx[h_axis] = slice(lh, x.shape[h_axis] - uh)
    if lw + uw > 0:
        idx[w_axis] = slice(lw, x.shape[w_axis] - uw)
    return x[tuple(idx)]
