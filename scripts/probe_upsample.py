"""A/B the old two-pass upsample_bilinear vs the new deferred-interleave one
inside a single process (the chip is time-shared; only same-process deltas
are comparable). Times the full decode(segment) with each implementation
monkeypatched in, plus the bare upsample ops.

  python scripts/probe_upsample.py
"""
import functools
import sys
import time
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax
import jax.numpy as jnp

import deva_tpu.ops.resize as resize_mod
from deva_tpu.ops.resize import _upsample_axis_stencil


@functools.partial(jax.jit, static_argnums=(1,))
def old_upsample(x, factor):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    wts, base = _upsample_axis_stencil(factor)

    def up1(y, axis):
        n = y.shape[axis]
        pad_width = [(0, 0)] * y.ndim
        pad_width[axis] = (1, 1)
        yp = jnp.pad(y, pad_width, mode="edge")
        outs = []
        for p in range(factor):
            b = int(base[p])
            t0 = jax.lax.slice_in_dim(yp, 1 + b, 1 + b + n, axis=axis)
            t1 = jax.lax.slice_in_dim(yp, 2 + b, 2 + b + n, axis=axis)
            outs.append(float(wts[p, 0]) * t0 + float(wts[p, 1]) * t1)
        stacked = jnp.stack(outs, axis=axis + 1)
        new_shape = list(y.shape)
        new_shape[axis] = n * factor
        return stacked.reshape(new_shape)

    out = up1(xf, xf.ndim - 3)
    out = up1(out, xf.ndim - 2)
    return out.astype(orig_dtype)


new_upsample = resize_mod.upsample_bilinear


def timed_scan(name, fn, carry0, n=20):
    @jax.jit
    def run(c0):
        return jax.lax.scan(lambda c, i: (fn(c, i), 0), c0, jnp.arange(n))[0]

    out = run(carry0)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = run(jax.tree.map(
            lambda x: x + jnp.asarray(rep + 1, x.dtype) * 1e-6
            if jnp.issubdtype(x.dtype, jnp.floating) else x, carry0))
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append((time.perf_counter() - t0) / n)
    t = sorted(ts)[1]
    print(f"{name:36s} {t * 1e3:8.2f} ms")
    return t


def patch(impl):
    import deva_tpu.models.blocks as blocks_mod
    import deva_tpu.models.network as network_mod
    resize_mod.upsample_bilinear = impl
    blocks_mod.upsample_bilinear = impl
    network_mod.upsample_bilinear = impl


def main():
    from deva_tpu.config import ModelConfig
    from deva_tpu.models.network import DEVANetwork

    h, w, o, b = 480, 864, 3, 1
    model = DEVANetwork(ModelConfig(dtype="bfloat16"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 1, 32, 32)), jnp.zeros((1, 1, 2, 2, 512)))
    rng = np.random.default_rng(0)
    hq, wq = h // 16, w // 16
    cv = model.config.value_dim
    ms_feats, _ = model.apply(variables,
                              jnp.asarray(rng.standard_normal((b, h, w, 3)),
                                          jnp.float32),
                              method=DEVANetwork.encode_image)
    readout0 = jnp.asarray(rng.standard_normal((b, o, hq, wq, cv)),
                           jnp.float32)
    sensory0 = jnp.zeros((b, o, hq, wq, cv), jnp.float32)
    lm0 = jnp.asarray(rng.uniform(0, 1, (b, o, h, w)), jnp.float32)
    selector = jnp.ones((b, o), jnp.float32)

    # bare op: [3, 60, 108, 256] bf16 x2 (the up_8_4 shape)
    g = jnp.asarray(rng.standard_normal((3, 60, 108, 256)), jnp.bfloat16)
    for tag, impl in (("old", old_upsample), ("new", new_upsample)):
        timed_scan(f"bare up x2 60x108x256 bf16 [{tag}]",
                   lambda c, i, impl=impl: c + 1e-3 * impl(c, 2)[:, ::2, ::2],
                   g)

    @functools.partial(jax.jit, static_argnums=(1,))
    def new_f32(x, factor):
        return new_upsample(x.astype(jnp.float32), factor).astype(x.dtype)

    @functools.partial(jax.jit, static_argnums=(1,))
    def old_bf16(x, factor):
        wts, base = _upsample_axis_stencil(factor)

        def up1(y, axis):
            n = y.shape[axis]
            pad_width = [(0, 0)] * y.ndim
            pad_width[axis] = (1, 1)
            yp = jnp.pad(y, pad_width, mode="edge")
            outs = []
            for p in range(factor):
                b = int(base[p])
                t0 = jax.lax.slice_in_dim(yp, 1 + b, 1 + b + n, axis=axis)
                t1 = jax.lax.slice_in_dim(yp, 2 + b, 2 + b + n, axis=axis)
                outs.append(float(wts[p, 0]) * t0 + float(wts[p, 1]) * t1)
            stacked = jnp.stack(outs, axis=axis + 1)
            new_shape = list(y.shape)
            new_shape[axis] = n * factor
            return stacked.reshape(new_shape)

        return up1(up1(x, x.ndim - 3), x.ndim - 2)

    @functools.partial(jax.jit, static_argnums=(1,))
    def depthwise(x, factor):
        if factor % 2 or factor > 4:
            return old_upsample(x, factor)
        c = x.shape[-1]
        wts, base = _upsample_axis_stencil(factor)
        s = factor // 2 - 1
        k1 = np.zeros(2 * factor)
        for p in range(factor):
            t0 = factor * int(base[p]) + factor - p + s
            k1[t0] = wts[p, 0]
            k1[t0 + factor] = wts[p, 1]
        k2 = jnp.asarray(np.outer(k1, k1), x.dtype)
        kernel = jnp.broadcast_to(k2[..., None, None],
                                  (2 * factor, 2 * factor, 1, c))
        lead = x.shape[:-3]
        xf = x.reshape((-1,) + x.shape[-3:])
        xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        out = jax.lax.conv_general_dilated(
            xp, kernel, window_strides=(1, 1), padding=[(s, s), (s, s)],
            lhs_dilation=(factor, factor),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        return out.reshape(lead + out.shape[-3:])

    @functools.partial(jax.jit, static_argnums=(1,))
    def wfirst(x, factor):
        wts, base = _upsample_axis_stencil(factor)

        def up1(y, axis):
            n = y.shape[axis]
            pad_width = [(0, 0)] * y.ndim
            pad_width[axis] = (1, 1)
            yp = jnp.pad(y, pad_width, mode="edge")
            outs = []
            for p in range(factor):
                b = int(base[p])
                t0 = jax.lax.slice_in_dim(yp, 1 + b, 1 + b + n, axis=axis)
                t1 = jax.lax.slice_in_dim(yp, 2 + b, 2 + b + n, axis=axis)
                outs.append(float(wts[p, 0]) * t0 + float(wts[p, 1]) * t1)
            stacked = jnp.stack(outs, axis=axis + 1)
            new_shape = list(y.shape)
            new_shape[axis] = n * factor
            return stacked.reshape(new_shape)

        return up1(up1(x, x.ndim - 2), x.ndim - 3)

    for tag, impl in (("old", old_upsample), ("wfirst", wfirst),
                      ("old2", old_upsample), ("wfirst2", wfirst)):
        patch(impl)

        def dec(c, i):
            _, _, prob = model.apply(
                variables, ms_feats, c, sensory0, lm0, selector=selector,
                update_sensory=True, method=DEVANetwork.segment)
            return c + 1e-6 * jnp.mean(prob)

        timed_scan(f"decode(segment) [{tag}]", dec, readout0)


if __name__ == "__main__":
    main()
