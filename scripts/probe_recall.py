"""On-chip timing of the approx-top-k threshold computation vs recall_target
and the two-stage (aggregate_to_topk=False) variant, at the serving attention
shape [16, 1620, N]. The k-th returned value only serves as the threshold of
the support (support >= kth always CONTAINS the exact top-k for any recall),
so lower recall trades a slightly wider support for a much cheaper final sort.

  python scripts/probe_recall.py [--tokens N]
"""
import sys
import time
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, x, n=20):
    @jax.jit
    def run(c0):
        def body(c, i):
            v = fn(c + i * 1e-6)
            return c + 1e-6 * v.mean(), 0
        return jax.lax.scan(body, c0, jnp.arange(n, dtype=x.dtype))[0]

    out = run(x)
    _ = float(out.ravel()[0])
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(run(x + (rep + 1) * 1e-6).ravel()[0])
        ts.append((time.perf_counter() - t0) / n)
    t = sorted(ts)[1]
    print(f"{name:42s} {t * 1e3:8.3f} ms")
    return t


def main():
    n = int(sys.argv[sys.argv.index("--tokens") + 1]) \
        if "--tokens" in sys.argv else 16712
    b, q, k = 16, 1620, 30
    rng = np.random.default_rng(0)
    sim = jnp.asarray(rng.standard_normal((b, q, n)), jnp.float32)
    print(f"platform={jax.devices()[0].platform} sim [{b},{q},{n}] k={k}")

    # reduction size per recall (static; from one lowering)
    for rt in (0.95, 0.9, 0.85, 0.8, 0.7):
        shp = jax.eval_shape(
            lambda s: jax.lax.approx_max_k(s, k, recall_target=rt,
                                           aggregate_to_topk=False)[0],
            sim).shape
        print(f"  recall {rt}: reduced l = {shp[-1]}")

    for rt in (0.95, 0.9, 0.85, 0.8, 0.7):
        timed(f"approx_max_k recall={rt}",
              lambda s, rt=rt: jax.lax.approx_max_k(
                  s, k, recall_target=rt)[0][..., -1], sim)

    def two_stage(s):
        red, _ = jax.lax.approx_max_k(s, k, aggregate_to_topk=False)
        vals, _ = jax.lax.approx_max_k(red, k)
        return vals[..., -1]

    timed("two-stage (0.95 reduce, approx kth)", two_stage, sim)

    def reduce_only(s):
        red, _ = jax.lax.approx_max_k(s, k, aggregate_to_topk=False)
        return red.max(-1)

    timed("reduce only (no kth)", reduce_only, sim)


if __name__ == "__main__":
    main()
