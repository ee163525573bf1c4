"""step_chunk (one-launch lax.scan over frames) must produce exactly the same
results as per-frame step(), including memory writes, usage counting and
consolidation boundaries."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork

H, W = 64, 96


@pytest.fixture(scope="module")
def model_and_vars():
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    return model, variables


def _video(rng, t):
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    frames = [np.kron(base + 0.1 * rng.standard_normal((H // 8, W // 8, 3)),
                      np.ones((8, 8, 1))).astype(np.float32)
              for _ in range(t)]
    mask0 = np.zeros((H, W), np.int64)
    mask0[8:28, 10:40] = 1
    mask0[36:60, 50:90] = 2
    return frames, mask0


@pytest.mark.parametrize("preencode", [False, True])
@pytest.mark.parametrize("long_term", [False, True])
def test_chunk_equals_per_frame(model_and_vars, long_term, preencode):
    """preencode=False: the per-frame scan body, whose in-block compute
    order matches step() exactly — early frames must be near-exact.
    preencode=True: the restructured body (batched K-frame encode + one
    K*Q-query attention + decode-only scan) is mathematically exact but its
    batched conv schedules differ from the b=1 encode at the float-noise
    level, which random-init shrinkage (~500) amplifies — every frame gets
    the pixel budget instead."""
    model, variables = model_and_vars
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=long_term,
                          enable_long_term_count_usage=long_term,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=16, max_long_term_elements=96,
                          preencode_blocks=preencode)
    rng = np.random.default_rng(5)
    frames, mask0 = _video(rng, 11)

    core_a = InferenceCore(model, variables, cfg)
    probs_a = [np.asarray(core_a.step(frames[0], mask0, objects=[1, 2]))]
    for i, f in enumerate(frames[1:], start=1):
        probs_a.append(np.asarray(core_a.step(f, end=(i == len(frames) - 1))))

    core_b = InferenceCore(model, variables, cfg)
    probs_b = [np.asarray(core_b.step(frames[0], mask0, objects=[1, 2]))]
    probs_b += [np.asarray(p)
                for p in core_b.step_chunk(frames[1:], end=True)]

    assert len(probs_a) == len(probs_b)
    # The scan body compiles to a different op schedule than the unrolled
    # step, so values written to memory differ at the 1e-4 level; random-init
    # weights (shrinkage up to ~500) hyper-amplify bank noise at boundary
    # pixels over the recurrence. Frames before the first in-scan write must
    # be near-exact; later frames get a small pixel budget.
    for ti, (a, b) in enumerate(zip(probs_a, probs_b)):
        if ti <= 2 and not preencode:
            np.testing.assert_allclose(b, a, atol=1e-4,
                                       err_msg=f"frame {ti}")
        else:
            bad = (np.abs(b - a) > 5e-3).any(axis=0)
            assert bad.mean() <= 0.02, \
                f"frame {ti}: {bad.mean():.2%} pixels differ"
            diff = a.argmax(0) != b.argmax(0)
            assert diff.mean() <= 0.02, \
                f"frame {ti}: {diff.mean():.2%} argmax mismatch"

    assert core_a.curr_ti == core_b.curr_ti
    assert core_a.last_mem_ti == core_b.last_mem_ti
    (_, ba), = core_a.memory.buckets.items()
    (_, bb), = core_b.memory.buckets.items()
    assert ba.size == bb.size
    key_tol = 5e-3 if preencode else 5e-4
    np.testing.assert_allclose(np.asarray(bb.key[:bb.size]),
                               np.asarray(ba.key[:ba.size]), atol=key_tol)
    if long_term:
        np.testing.assert_allclose(np.asarray(bb.use_cnt),
                                   np.asarray(ba.use_cnt), rtol=5e-2,
                                   atol=5e-2)
        lta = core_a.memory.long_buckets
        ltb = core_b.memory.long_buckets
        assert set(lta) == set(ltb)
        for k in lta:
            assert lta[k].size == ltb[k].size
            np.testing.assert_allclose(np.asarray(ltb[k].key[:ltb[k].size]),
                                       np.asarray(lta[k].key[:lta[k].size]),
                                       atol=5e-3)
