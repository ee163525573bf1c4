"""Per-stage device timing of the propagation step at 480p serving shapes.
Each stage is launched with R repetitions chained into ONE program (with
data dependencies through a scalar mix so XLA can't dedup/elide), so the
~30 ms relay round-trip amortizes away and the per-rep time is honest
device time."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.models.network import DEVANetwork
from deva_tpu.ops import memory_attention as ma
from deva_tpu.inference.memory import _readout_token_major

B, H, W = 8, 480, 864
HP, WP = 480, 864  # already /16
HQ, WQ = HP // 16, WP // 16
QN = HQ * WQ
O = 4
CAP = 21060
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
    print(f"{name:36s} {med/R*1e3:8.2f} ms/rep  ({med*1e3:7.1f} ms/launch)",
          flush=True)
    return med / R


def main():
    dtype = "bfloat16"
    model = DEVANetwork(ModelConfig(dtype=dtype))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 1, 32, 32)), jnp.zeros((1, 1, 2, 2, 512)))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, HP, WP, 3)), jnp.float32)

    # --- encode_image + key projection, R reps in one launch
    @jax.jit
    def enc(img):
        outs = []
        x = img
        for i in range(R):
            ms, feat = model.apply(variables, x,
                                   method=DEVANetwork.encode_image)
            k, sh, se = model.apply(variables, feat,
                                    method=DEVANetwork.transform_key)
            outs.append(k.mean())
            x = img * (1.0 + 1e-6 * k.mean().astype(img.dtype))
        return jnp.stack(outs)
    t_enc = timed(f"encode+key B={B}", enc, img)

    # --- attention: sim + topk + readout at CAP tokens
    key_ring = jnp.asarray(rng.standard_normal((B, CAP, 64)), jnp.bfloat16)
    shr = jnp.abs(jnp.asarray(rng.standard_normal((B, CAP)), jnp.bfloat16))
    val = jnp.asarray(rng.standard_normal((B, CAP, O, 512)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((B, QN, 64)), jnp.float32)
    size = jnp.full((B,), CAP - 1620, jnp.int32)

    def attend1(key_ring, shr, val, qk, qe, size):
        valid = jnp.arange(CAP) < size
        sim = ma.get_similarity(key_ring, shr, qk, qe)
        aff = ma.topk_softmax(sim, 30, valid)
        return _readout_token_major(aff, val)

    @jax.jit
    def att(key_ring, shr, val, qk, size):
        outs = []
        q = qk
        for i in range(R):
            rd = jax.vmap(attend1)(key_ring, shr, val, q, q, size)
            outs.append(rd.mean())
            q = qk * (1.0 + 1e-6 * rd.mean().astype(qk.dtype))
        return jnp.stack(outs)
    t_att = timed(f"attend cap={CAP}", att, key_ring, shr, val, qk, size)

    # --- attention pieces
    def sim_only(key_ring, shr, qk, qe):
        return ma.get_similarity(key_ring, shr, qk, qe)

    @jax.jit
    def simf(key_ring, shr, qk):
        outs = []
        q = qk
        for i in range(R):
            s = jax.vmap(sim_only)(key_ring, shr, q, q)
            outs.append(s.mean())
            q = qk * (1.0 + 1e-6 * s.mean().astype(qk.dtype))
        return jnp.stack(outs)
    timed("  similarity only", simf, key_ring, shr, qk)

    sim_in = jnp.asarray(rng.standard_normal((B, QN, CAP)), jnp.float32)

    @jax.jit
    def topkf(sim_in, size):
        outs = []
        s = sim_in
        for i in range(R):
            aff = jax.vmap(lambda s, sz: ma.topk_softmax(
                s, 30, jnp.arange(CAP) < sz))(s, size)
            outs.append(aff.mean())
            s = sim_in * (1.0 + 1e-6 * aff.mean())
        return jnp.stack(outs)
    timed("  topk_softmax only", topkf, sim_in, size)

    @jax.jit
    def rdf(sim_in, val):
        outs = []
        s = sim_in
        for i in range(R):
            rd = jax.vmap(_readout_token_major)(s, val)
            outs.append(rd.mean())
            s = sim_in * (1.0 + 1e-6 * rd.mean().astype(sim_in.dtype))
        return jnp.stack(outs)
    timed("  readout only", rdf, sim_in, val)

    # --- segment (decoder + aggregate + upsample)
    ms0 = jnp.asarray(rng.standard_normal((B, HQ, WQ, 512)), jnp.bfloat16)
    ms1 = jnp.asarray(rng.standard_normal((B, HQ*2, WQ*2, 512)), jnp.bfloat16)
    ms2 = jnp.asarray(rng.standard_normal((B, HQ*4, WQ*4, 256)), jnp.bfloat16)
    rd = jnp.asarray(rng.standard_normal((B, O, HQ, WQ, 512)), jnp.float32)
    sens = jnp.zeros((B, O, HQ, WQ, 512), jnp.float32)
    lm = jnp.asarray(rng.uniform(0, 1, (B, O, HP, WP)), jnp.float32)
    sel = jnp.ones((B, O), jnp.float32)

    @jax.jit
    def seg(ms0, ms1, ms2, rd, sens, lm):
        outs = []
        r = rd
        for i in range(R):
            s2, _, prob = model.apply(
                variables, (ms0, ms1, ms2), r, sens, lm, selector=sel,
                update_sensory=True, method=DEVANetwork.segment)
            outs.append(prob.mean())
            r = rd * (1.0 + 1e-6 * prob.mean().astype(rd.dtype))
        return jnp.stack(outs)
    t_seg = timed("segment(decode+agg)", seg, ms0, ms1, ms2, rd, sens, lm)

    # --- encode_mask (write frames only)
    @jax.jit
    def encm(img, sens, lm):
        outs = []
        x = img
        for i in range(R):
            v, s2 = model.apply(variables, x, ms0, sens, lm,
                                deep_update=True,
                                method=DEVANetwork.encode_mask)
            outs.append(v.mean())
            x = img * (1.0 + 1e-6 * v.mean().astype(img.dtype))
        return jnp.stack(outs)
    t_em = timed("encode_mask", encm, img, sens, lm)

    per_frame = t_enc + t_att + t_seg
    print(f"\nread-frame total  {per_frame*1e3:7.2f} ms "
          f"(x{B} videos -> {B/per_frame:6.1f} fps aggregate)")
    print(f"write-frame extra {t_em*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
