"""A/B probe: ResNet stem conv (7x7 stride-2, Cin=3) vs an EXACT
space-to-depth rewrite (4x4 conv on 2x2-block-rearranged input, Cin=12).

The s2d form is the standard TPU trick for tiny-Cin stride-2 stems: the MXU
reads 128-lane input tiles, so Cin=3 occupies 3/128 lanes (~2% MXU) while
Cin=12 occupies 4x more, at the price of 8*8/(7*7) ~ 1.31x the MAC count
(the 7x7 kernel zero-pads to 8x8 before the [4,4,4Cin,Cout] reshape).

Derivation (per axis): out[i] = sum_d W[d] x[2i + d - 3]. Writing the tap
coordinate 2i + d - 3 = 2(i + m) + p with p in {0,1} gives d = 2m + p + 3,
m in {-2..1} -> a 4-tap stride-1 conv over the s2d axis with padding (2,1)
and the (m=-2, p=0) tap zero. Edges match the original zero padding exactly.

  python scripts/probe_stem.py [--batch 16]

MEASURED (v5e via relay, batch 16, bf16, 480x864): NEGATIVE — 7x7 Cin=3
stem 5.61 ms/launch vs s2d 4x4 Cin=12 6.09 ms (parity 7e-7). XLA's TPU
backend already space-to-depth-optimizes small-Cin strided convs
internally; the explicit rearrange only adds a transpose. Keep the
plain stem.
"""
import sys
import time
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax
import jax.numpy as jnp


def s2d_kernel(w):
    """[7,7,C,F] stem kernel -> ([4,4,4C,F]) for the s2d form."""
    k7, _, c, f = w.shape
    assert k7 == 7
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # d = 2m+p+3, zero tap first
    # index [2m+p+3+1 for m in 0..3 gives 8 slots]: slot s = 2m+p -> (m, p)
    wp = wp.reshape(4, 2, 4, 2, c, f)          # [m, p, n, q, C, F]
    return wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, f)


def s2d_input(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C] with (p,q,c) channel order matching
    s2d_kernel."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def timed(name, fn, x, n=20):
    @jax.jit
    def run(x0):
        return jax.lax.scan(lambda c, i: (fn(c), 0), x0, jnp.arange(n))[0]

    out = run(x)
    _ = float(jnp.asarray(out).ravel()[0])
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = run(x + jnp.asarray(1e-6 * (rep + 1), x.dtype))
        _ = float(jnp.asarray(out).ravel()[0])
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:18s} {sorted(ts)[1] * 1e3:8.3f} ms/launch-iter")


def main():
    b = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv \
        else 16
    h, w, cin, cout = 480, 864, 3, 64
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dt)
    k = jnp.asarray(0.1 * rng.standard_normal((7, 7, cin, cout)), dt)
    k2 = s2d_kernel(k)
    print(f"platform={jax.devices()[0].platform} {b}x{h}x{w}x{cin}")

    def stem(xc):
        out = jax.lax.conv_general_dilated(
            xc, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return xc + 1e-6 * out.mean().astype(dt)

    def stem_s2d(xc):
        xs = s2d_input(xc)
        out = jax.lax.conv_general_dilated(
            xs, k2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return xc + 1e-6 * out.mean().astype(dt)

    # parity check (f32 on small input)
    xs = jnp.asarray(rng.standard_normal((1, 32, 40, cin)), jnp.float32)
    kf = k.astype(jnp.float32)
    a = jax.lax.conv_general_dilated(xs, kf, (2, 2), ((3, 3), (3, 3)),
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
    bb = jax.lax.conv_general_dilated(
        s2d_input(xs), s2d_kernel(kf), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.abs(a - bb).max())
    print(f"parity max|diff| (f32): {err:.2e}")
    assert err < 1e-5, err

    timed("stem 7x7 Cin=3", stem, x)
    timed("stem s2d 4x4 Cin=12", stem_s2d, x)


if __name__ == "__main__":
    main()
