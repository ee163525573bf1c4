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
from deva_tpu.ops.pallas_attention import attend_pallas


def timed(fn, *args, reps=6):
    out = fn(*args)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out)[0, 0, 0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(
            out[0] if isinstance(out, tuple) else out)[0, 0, 0])
        ts.append(time.perf_counter() - t0)
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

    approx = jax.jit(lambda: ma.attend(mk, ms, v_om, qk, qe, top_k=k,
                                       valid=valid, return_usage=True,
                                       method="approx"))
    exact = jax.jit(lambda: ma.attend(mk, ms, v_om, qk, qe, top_k=k,
                                      valid=valid, return_usage=True,
                                      method="exact"))
    fused = jax.jit(lambda: attend_pallas(mk, ms, v_nm, qk, qe, top_k=k,
                                          valid=valid, return_usage=True))

    print(f"platform={jax.devices()[0].platform}  n={n} q={q} o={o} cv={cv}")
    for name, fn in [("xla_approx_dense", approx), ("xla_exact_dense", exact),
                     ("pallas_fused_exact", fused)]:
        try:
            t = timed(fn)
            print(f"{name:22s} {t * 1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:22s} FAILED: {e!r}")

    # sanity: fused == exact on-device
    ef, uf = fused()
    ee, ue = exact()
    d = float(jnp.max(jnp.abs(ef - ee)))
    du = float(jnp.max(jnp.abs(uf - ue)))
    print(f"fused vs exact: max|readout diff|={d:.3e} max|usage diff|={du:.3e}")


if __name__ == "__main__":
    main()
