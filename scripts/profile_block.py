"""Capture a jax.profiler trace of the production serving block launch
(batch 16 x 5 frames, long-term ON) for kernel-level analysis.

  python scripts/profile_block.py [--out DIR]

Writes a TensorBoard-loadable trace under DIR (default ./profiles). The
next optimization targets, per scripts/probe_components.py: decode 4.75 ms
(~20-40% MXU util on the 256-channel upsampling trunk) and encode at small
batch.
"""
import sys
import time
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.batched import BatchedPropagator
from deva_tpu.models.network import DEVANetwork


def main():
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv \
        else "./profiles"
    h, w, batch, k = 480, 864, 16, 5
    model = DEVANetwork(ModelConfig(dtype="bfloat16"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 1, 32, 32)), jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(ring_dtype="bfloat16", mem_every=k)

    rng = np.random.default_rng(0)
    base = rng.standard_normal((h, w, 3)).astype(np.float32)
    mask0 = np.zeros((h, w), np.int64)
    mask0[80:240, 100:400] = 1
    mask0[300:440, 500:800] = 2
    mask0[60:160, 600:840] = 3
    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([base] * batch, [mask0] * batch, [[1, 2, 3]] * batch)

    base_dev = jnp.asarray(base)

    @jax.jit
    def gen(key):
        return base_dev[None, None] + 0.05 * jax.random.normal(
            key, (batch, k, h, w, 3), jnp.float32)

    blocks = [gen(jax.random.PRNGKey(i)) for i in range(4)]
    # warm past LT saturation so the profiled launches are steady state
    for i in range(12):
        p = bp.step_block(blocks[i % 4])
    _ = float(p[0, 0, 0, 0, 0])

    with jax.profiler.trace(out):
        for i in range(3):
            p = bp.step_block(blocks[i % 4])
        _ = float(p[0, 0, 0, 0, 0])
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
