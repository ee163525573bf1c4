"""A/B the single-stream block bodies on-chip: per-frame scan
(encode+attend+decode per iteration, FusedStepper._raw_block) vs the
restructured pre-encoded body (ONE conv batch for all K frames + ONE
K*Q-query attention + decode-only scan, FusedStepper._raw_block_preenc).

Times one launch of a lax.scan over N whole blocks with varying frames
(honest device time on the time-shared relay chip; see CLAUDE.md).

  python scripts/probe_preenc.py
"""
import sys
import time
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deva_tpu.config import ModelConfig
from deva_tpu.models.network import DEVANetwork
from deva_tpu.inference.fused_step import FusedStepper


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    h, w = 480, 864
    o_cap, num_obj = 4, 3
    k_frames = 5          # n_read=4 + one write frame (mem_every=5 cadence)
    n_iters = 8
    model = DEVANetwork(ModelConfig(dtype="bfloat16"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 1, 32, 32)), jnp.zeros((1, 1, 2, 2, 512)))
    rng = np.random.default_rng(0)
    hq, wq = h // 16, w // 16
    q = hq * wq
    ck, cv = model.config.key_dim, model.config.value_dim
    cap, size = 11 * q, 10 * q   # work ring saturated at T_max=10 frames
    dt = jnp.bfloat16

    frames = jnp.asarray(rng.standard_normal((k_frames, h, w, 3)),
                         jnp.float32)
    key_ring = jnp.asarray(rng.standard_normal((cap, ck)), dt)
    shr_ring = jnp.asarray(rng.uniform(1, 4, (cap,)), dt)
    sel_ring = jnp.asarray(rng.uniform(0, 1, (cap, ck)), dt)
    value_ring = jnp.asarray(rng.standard_normal((cap, o_cap, cv)), dt)
    use0 = jnp.zeros((cap,), jnp.float32)
    life0 = jnp.full((cap,), 1e-7, jnp.float32)
    sensory0 = jnp.zeros((o_cap, hq, wq, cv), jnp.float32)
    lm0 = jnp.asarray(rng.uniform(0, 0.3, (o_cap, h, w)), jnp.float32)
    lt_args = (jnp.zeros((0, ck)), jnp.zeros((0,)),
               jnp.zeros((0, o_cap, cv)), None, None, 0)
    pads = (0, 0, 0, 0)

    stepper = FusedStepper(model, top_k=30, topk_method="approx")
    print(f"platform={jax.devices()[0].platform} {h}x{w} o={num_obj} "
          f"K={k_frames} ring={size} tokens")

    def time_body(name, raw):
        # big loop-invariant tensors go through jit ARGUMENTS — closed-over
        # device arrays are embedded in the HLO as literal constants, and
        # the relay's remote_compile endpoint rejects oversized bodies
        # (HTTP 413); see scripts/probe_components.py::timed_scan.
        def iteration(carry, ex, i):
            sensory, last_mask, use_cnt, life_cnt = carry
            vs, frs, kr, sr, selr, vr = ex
            out = raw(vs, frs + i.astype(jnp.float32) * 1e-6,
                      pads, num_obj, kr, sr, selr, vr,
                      use_cnt, life_cnt, size, *lt_args,
                      sensory, last_mask)
            (_probs, sensory, last_mask, _kr, _sr, _selr, _vr,
             use_cnt, life_cnt, _lu, _ll) = out
            return (sensory, last_mask[:, :h, :w], use_cnt, life_cnt)

        @jax.jit
        def run(c0, ex):
            body = lambda c, i: (iteration(c, ex, i), 0)
            return jax.lax.scan(body, c0, jnp.arange(n_iters))[0]

        ex = (variables, frames, key_ring, shr_ring, sel_ring, value_ring)
        c0 = (sensory0, lm0, use0, life0)
        out = run(c0, ex)
        _ = float(jnp.asarray(out[0]).ravel()[0])   # honest sync
        ts = []
        for rep in range(3):
            c = (sensory0 + rep * 1e-6, lm0, use0, life0)
            t0 = time.perf_counter()
            out = run(c, ex)
            _ = float(jnp.asarray(out[0]).ravel()[0])
            ts.append((time.perf_counter() - t0) / (n_iters * k_frames))
        t = sorted(ts)[1]
        print(f"{name:28s} {t * 1e3:8.2f} ms/frame")
        return t

    t_old = time_body("per-frame scan (old)",
                      stepper._raw_block(k_frames - 1, True, False, True,
                                         False))
    t_new = time_body("pre-encoded block (new)",
                      stepper._raw_block_preenc(k_frames - 1, True, False,
                                                True, False))
    print(f"speedup {t_old / t_new:.3f}x")


if __name__ == "__main__":
    main()
