"""Resize ops with torch-compatible semantics, NHWC layout.

The reference uses F.interpolate with mode='area' for downsampling
(reference:deva/model/network.py:117, group_modules.py:34-38) and
mode='bilinear', align_corners=False for upsampling
(reference:deva/model/network.py:156,167, group_modules.py:27-31).

- area downsampling by an integer factor == average pooling (exact).
- bilinear align_corners=False == half-pixel-centers linear resize, which is
  what jax.image.resize computes; we implement the x2/x4 upsample hot path as a
  reshape/weighted-stencil instead, which XLA fuses much better than the
  general gather-based resize.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def downsample_area(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool H and W (axes -3, -2) by an integer factor. NHWC/...HWC."""
    *lead, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (x.shape, factor)
    x = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(-4, -2))


def _upsample_axis_stencil(factor: int):
    """For align_corners=False upsampling by integer `factor`, output pixel j
    maps to input coordinate (j + 0.5)/factor - 0.5. For interior pixels this is
    a 2-tap stencil with phase-dependent weights; edges clamp (handled by the
    caller via edge padding). Static (numpy) so it folds into the trace.

    Returns (weights [factor, 2], base offsets [factor] in {-1, 0})."""
    import numpy as np
    j = np.arange(factor, dtype=np.float64)
    src = (j + 0.5) / factor - 0.5  # in [-0.5, 1) relative to input pixel 0
    base = np.floor(src).astype(np.int64)
    frac = src - base
    wts = np.stack([1.0 - frac, frac], axis=-1).astype(np.float32)
    return wts, base


@functools.partial(jax.jit, static_argnums=(1,))
def upsample_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Bilinear (align_corners=False) upsample of H,W axes (-3,-2) by an integer
    factor. Matches torch F.interpolate(..., mode='bilinear',
    align_corners=False) exactly for integer scale factors.

    Implementation: separable 2-tap phase stencil. Output pixel (phase p) at
    block i reads input pixels i + floor((p+0.5)/f - 0.5) and +1, clamped at the
    borders. We pad the input by 1 on each side (edge-replicate) so every block
    uses the same gather-free stencil, then combine with per-phase weights.
    """
    # Compute in the input dtype for the low-precision compute dtypes: the
    # stencil chain is pure HBM traffic and f32 intermediates double its
    # bytes (torch amp runs F.interpolate in fp16 the same way). f32 (and
    # anything else) computes in f32 as before.
    orig_dtype = x.dtype
    cdt = orig_dtype if orig_dtype in (jnp.bfloat16, jnp.float16) \
        else jnp.float32
    xf = x.astype(cdt)
    wts, base = _upsample_axis_stencil(factor)

    def up1(y, axis):
        # y: [..., n, ...]; upsample `axis` by factor
        n = y.shape[axis]
        pad_width = [(0, 0)] * y.ndim
        pad_width[axis] = (1, 1)
        yp = jnp.pad(y, pad_width, mode="edge")  # index i in yp = i-1 in y
        # For phase p: taps at y[i + base[p]] and y[i + base[p] + 1]
        # = yp[i + base[p] + 1], yp[i + base[p] + 2]
        outs = []
        for p in range(factor):
            b = int(base[p])
            t0 = jax.lax.slice_in_dim(yp, 1 + b, 1 + b + n, axis=axis)
            t1 = jax.lax.slice_in_dim(yp, 2 + b, 2 + b + n, axis=axis)
            w0 = jnp.asarray(wts[p, 0], cdt)
            w1 = jnp.asarray(wts[p, 1], cdt)
            outs.append(w0 * t0 + w1 * t1)
        stacked = jnp.stack(outs, axis=axis + 1)  # [..., n, f, ...]
        new_shape = list(y.shape)
        new_shape[axis] = n * factor
        return stacked.reshape(new_shape)

    h_axis = xf.ndim - 3
    w_axis = xf.ndim - 2
    out = up1(xf, h_axis)
    out = up1(out, w_axis)
    return out.astype(orig_dtype)
