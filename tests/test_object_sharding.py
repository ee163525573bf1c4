"""Object-axis ('model' mesh axis) sharded serving == unsharded serving.

SURVEY §2.8 TP row: the object dimension is embarrassingly parallel
(reference:deva/model/group_modules.py:6-7); InferenceCore(obj_mesh=...)
shards per-object state over the mesh's 'model' axis and XLA's SPMD
partitioner splits the grouped decoder / mask encoder / value readout,
inserting the cross-object collective for the background product in
aggregate_logits. Placement only — the math is identical, so outputs must
match the single-device core up to collective reduction order.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork
from deva_tpu.parallel.mesh import make_mesh

H, W = 64, 96


@pytest.fixture(scope="module")
def model_and_vars():
    model = DEVANetwork(ModelConfig(pix_feat_dim=64, key_dim=16,
                                    value_dim=32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 32)))
    return model, variables


def _video(rng, t):
    frames = [rng.standard_normal((H, W, 3)).astype(np.float32)
              for _ in range(t)]
    mask0 = np.zeros((H, W), np.int64)
    mask0[4:20, 8:40] = 1
    mask0[30:60, 50:90] = 2
    mask0[4:20, 60:90] = 3
    mask0[40:60, 4:30] = 4
    return frames, mask0


def test_object_sharded_core_equals_unsharded(model_and_vars):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    model, variables = model_and_vars
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=3, min_mid_term_frames=1,
                          num_prototypes=8, topk_method="exact")
    rng = np.random.default_rng(7)
    frames, mask0 = _video(rng, 9)
    objects = [1, 2, 3, 4]  # o_cap 4 == the mesh's 'model' axis size

    core_ref = InferenceCore(model, variables, cfg)
    ref = [np.asarray(core_ref.step(frames[0], mask0, objects=objects))]
    ref += [np.asarray(core_ref.step(f)) for f in frames[1:]]

    mesh = make_mesh(2, 4)  # ('data', 'model') = (2, 4)
    core_sh = InferenceCore(model, variables, cfg, obj_mesh=mesh)
    got = [np.asarray(core_sh.step(frames[0], mask0, objects=objects))]
    got += [np.asarray(core_sh.step(f)) for f in frames[1:]]

    # sensory state actually lives sharded over the 'model' axis
    sens = core_sh.memory.sensory
    assert "model" in str(sens.sharding.spec), sens.sharding

    # identical math, different partitioning: early frames near-exact; the
    # recurrence amplifies reduction-order noise on later frames (same
    # budget scheme as tests/test_step_chunk.py)
    for ti, (a, b) in enumerate(zip(ref, got)):
        if ti <= 2:
            np.testing.assert_allclose(b, a, atol=2e-4,
                                       err_msg=f"frame {ti}")
        else:
            bad = (np.abs(b - a) > 5e-3).any(axis=0)
            assert bad.mean() <= 0.02, \
                f"frame {ti}: {bad.mean():.2%} pixels differ"
            flips = a.argmax(0) != b.argmax(0)
            assert flips.mean() <= 0.02, \
                f"frame {ti}: {flips.mean():.2%} argmax mismatch"

    # memory bookkeeping advanced identically
    assert core_ref.curr_ti == core_sh.curr_ti
    assert core_ref.last_mem_ti == core_sh.last_mem_ti
    (_, ba), = core_ref.memory.buckets.items()
    (_, bb), = core_sh.memory.buckets.items()
    assert ba.size == bb.size


def test_object_sharded_chunk(model_and_vars):
    """step_chunk (block launches) under object sharding."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    model, variables = model_and_vars
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                          topk_method="exact")
    rng = np.random.default_rng(8)
    frames, mask0 = _video(rng, 7)
    mesh = make_mesh(2, 4)

    core_a = InferenceCore(model, variables, cfg)
    pa = [np.asarray(core_a.step(frames[0], mask0, objects=[1, 2, 3, 4]))]
    pa += [np.asarray(p) for p in core_a.step_chunk(frames[1:])]

    core_b = InferenceCore(model, variables, cfg, obj_mesh=mesh)
    pb = [np.asarray(core_b.step(frames[0], mask0, objects=[1, 2, 3, 4]))]
    pb += [np.asarray(p) for p in core_b.step_chunk(frames[1:])]

    assert len(pa) == len(pb)
    for ti, (a, b) in enumerate(zip(pa, pb)):
        bad = (np.abs(b - a) > 5e-3).any(axis=0)
        assert bad.mean() <= 0.02, f"frame {ti}: {bad.mean():.2%}"
