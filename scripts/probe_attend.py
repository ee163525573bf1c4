"""On-chip timing probe: XLA approx-dense vs XLA exact vs fused Pallas
attention at serving shapes. Decides the default attention impl.

  python scripts/probe_attend.py          # on the tunneled TPU
"""
import sys
import time
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deva_tpu.ops import memory_attention as ma
from deva_tpu.ops.pallas_attention import attend_pallas, attend_pallas_approx


def timed(fn, reps=6, inner=8):
    """fn(i) must vary its inputs with i: the tunneled relay dedups repeated
    identical calls (CLAUDE.md), so identical-repeat timing lies. Each rep
    times `inner` distinct-input calls and reports the per-call median."""
    out = fn(0)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out)[0, 0, 0])
    ts = []
    step = 1
    for _i in range(reps):
        t0 = time.perf_counter()
        for _j in range(inner):
            out = fn(step)
            step += 1
        _ = float(jnp.asarray(
            out[0] if isinstance(out, tuple) else out)[0, 0, 0])
        ts.append((time.perf_counter() - t0) / inner)
    return sorted(ts)[len(ts) // 2]


def main():
    # serving shape: 480p queries, 10 work frames + 10k LT tokens, 4 objects
    q, ck, cv, o, k = 1632, 64, 512, 4, 30
    n = 16200 + 10048
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    mk = jnp.asarray(rng.standard_normal((n, ck)), dt)
    ms = jnp.asarray(rng.uniform(1, 4, (n,)), dt)
    v_nm = jnp.asarray(rng.standard_normal((n, o, cv)), dt)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)), jnp.float32)
    valid = jnp.arange(n) < (n - 1000)
    v_om = jnp.transpose(v_nm, (1, 0, 2))

    # every call perturbs qk by a per-step scalar so no two launches are
    # identical (the relay dedups identical calls)
    def vary(i):
        return qk + jnp.float32(i) * 1e-6

    approx = jax.jit(lambda dq: ma.attend(mk, ms, v_om, dq, qe, top_k=k,
                                          valid=valid, return_usage=True,
                                          method="approx"))
    exact = jax.jit(lambda dq: ma.attend(mk, ms, v_om, dq, qe, top_k=k,
                                         valid=valid, return_usage=True,
                                         method="exact"))
    fused = jax.jit(lambda dq: attend_pallas(mk, ms, v_nm, dq, qe, top_k=k,
                                             valid=valid, return_usage=True))
    fused_a = jax.jit(lambda dq: attend_pallas_approx(
        mk, ms, v_nm, dq, qe, top_k=k, valid=valid, return_usage=True))

    print(f"platform={jax.devices()[0].platform}  n={n} q={q} o={o} cv={cv}")
    for name, fn in [("xla_approx_dense", approx), ("xla_exact_dense", exact),
                     ("pallas_fused_exact", fused),
                     ("pallas_fused_approx", fused_a)]:
        try:
            t = timed(lambda i, f=fn: f(vary(i)))
            print(f"{name:22s} {t * 1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:22s} FAILED: {e!r}")

    # sanity: fused-exact == exact; fused-approx drift bounded
    ef, uf = fused(qk)
    ee, ue = exact(qk)
    ea, ua = fused_a(qk)
    d = float(jnp.max(jnp.abs(ef - ee)))
    du = float(jnp.max(jnp.abs(uf - ue)))
    print(f"fused vs exact: max|readout diff|={d:.3e} max|usage diff|={du:.3e}")
    da = float(jnp.max(jnp.abs(ea.astype(jnp.float32) - ee)))
    dua = float(jnp.max(jnp.abs(ua - ue)))
    print(f"fused-approx vs exact: max|readout diff|={da:.3e} "
          f"max|usage diff|={dua:.3e}")


if __name__ == "__main__":
    main()
