"""Round 2 of the top-k hunt: exact blocked variants with valid divisors,
bf16 top_k, approx recall sweep, and the full attend pipeline built on the
approx threshold. Shapes [B=8, Q=1620, N=21060]."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, Q, N, K = 8, 1620, 21060, 30
R = 8


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(f"{name:46s} {med/R*1e3:8.2f} ms/rep", flush=True)


def chain(op):
    def fn(sim):
        outs = []
        s = sim
        for i in range(R):
            r = op(s)
            outs.append(r)
            s = sim * (1.0 + 1e-6 * r)
        return jnp.stack(outs)
    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    sim = jnp.asarray(-np.abs(rng.standard_normal((B, Q, N))), jnp.float32)

    def blocked(s, blk):
        b, q, n = s.shape
        g = n // blk
        v1, _ = jax.lax.top_k(s.reshape(b, q, g, blk), K)
        v2, _ = jax.lax.top_k(v1.reshape(b, q, g * K), K)
        return v2.mean()
    for blk in (260, 324, 540):
        timed(f"blocked exact blk={blk}", chain(
            lambda s, blk=blk: blocked(s, blk)), sim)

    timed("top_k on bf16", chain(
        lambda s: jax.lax.top_k(s.astype(jnp.bfloat16), K)[0]
        .astype(jnp.float32).mean()), sim)

    for rt in (0.99, 0.999):
        timed(f"approx_max_k recall={rt}", chain(
            lambda s, rt=rt: jax.lax.approx_max_k(
                s, K, recall_target=rt)[0].mean()), sim)

    # full pipeline: approx threshold -> dense masked softmax (no scatter)
    def approx_thresh_softmax(s):
        v, _ = jax.lax.approx_max_k(s, K)     # [B, Q, K]
        kth = v[..., K - 1:K]
        mx = jnp.where(jnp.isfinite(v[..., :1]), v[..., :1], 0.0)
        e = jnp.where(s >= kth, jnp.exp(s - mx), 0.0)
        return e / jnp.sum(e, axis=-1, keepdims=True)
    timed("approx thresh dense softmax", chain(
        lambda s: approx_thresh_softmax(s).mean()), sim)

    # ... plus the readout matmul [Q,N]@[N,O*Cv]
    val = jnp.asarray(rng.standard_normal((B, N, 4 * 512)), jnp.bfloat16)

    @jax.jit
    def full(sim, val):
        outs = []
        s = sim
        for i in range(R):
            aff = approx_thresh_softmax(s)
            rd = jnp.einsum("bqn,bnc->bqc", aff.astype(jnp.bfloat16), val,
                            preferred_element_type=jnp.float32)
            m = rd.mean()
            outs.append(m)
            s = sim * (1.0 + 1e-6 * m)
        return jnp.stack(outs)
    timed("approx softmax + readout", full, sim, val)

    # recall check vs exact (host-side, one row sample)
    v_ex, i_ex = jax.lax.top_k(sim[0, :8], K)
    v_ap, i_ap = jax.lax.approx_max_k(sim[0, :8], K)
    rec = np.mean([len(set(np.asarray(i_ex[r])) &
                       set(np.asarray(i_ap[r]))) / K for r in range(8)])
    print(f"measured recall on sample rows: {rec:.3f}")


if __name__ == "__main__":
    main()
