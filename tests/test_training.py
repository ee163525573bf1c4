"""Training-step smoke tests on a virtual 8-device CPU mesh: loss decreases
and gradients flow through the full unrolled recurrence under data-parallel
sharding (the reference's DDP analog, reference:deva/model/trainer.py:27-30).
Uses a small model config so CPU compiles stay fast."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.config import ModelConfig, TrainConfig
from deva_tpu.models.network import DEVANetwork
from deva_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from deva_tpu.training.trainer import (TrainState, init_train_state,
                                       make_optimizer, make_train_step)

B, T, H, W, MAX_OBJ = 8, 3, 32, 32, 2


def _tiny_model():
    return DEVANetwork(ModelConfig(pix_feat_dim=64, key_dim=16, value_dim=32))


def _batch(rng):
    rgb = rng.standard_normal((B, T, H, W, 3)).astype(np.float32)
    cls_gt = rng.integers(0, MAX_OBJ + 1, (B, T, H, W)).astype(np.int32)
    first = np.stack([(cls_gt[:, 0] == i + 1) for i in range(MAX_OBJ)],
                     1).astype(np.float32)
    selector = np.ones((B, MAX_OBJ), np.float32)
    return {"rgb": rgb, "first_frame_gt": first, "cls_gt": cls_gt,
            "selector": selector}


@pytest.fixture(scope="module")
def trained():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, MAX_OBJ, 32, 32)), jnp.zeros((1, MAX_OBJ, 2, 2, 32)))
    cfg = TrainConfig(num_frames=T, num_ref_frames=2, lr=1e-4,
                      start_warm=10, end_warm=20, iterations=100,
                      steps=(60, 80))
    tx = make_optimizer(cfg, schedule="step")
    mesh = make_mesh(8, 1)
    step = make_train_step(model, tx, cfg, mesh=mesh)

    state = init_train_state(model, variables, tx)
    state = replicate(mesh, state)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, _batch(rng))

    metrics_hist = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        metrics_hist.append(jax.tree.map(float, metrics))
    return metrics_hist, state


def test_loss_finite_and_decreases(trained):
    hist, _ = trained
    losses = [m["total_loss"] for m in hist]
    assert all(np.isfinite(l) for l in losses), losses
    # same batch 4x -> loss must drop
    assert losses[-1] < losses[0], losses


def test_grad_norm_positive_and_clipped_path(trained):
    hist, state = trained
    assert hist[0]["grad_norm"] > 0
    assert int(state.it) == 4


def test_step_counter_and_sharding(trained):
    _, state = trained
    # replicated params: every device holds the full array
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_remat_matches_plain_forward():
    """cfg.remat only changes WHERE activations live (recompute-in-backward);
    forward outputs and gradients must match the plain path to fp tolerance."""
    from deva_tpu.training.trainer import forward_sequence
    from deva_tpu.training.losses import compute_losses

    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, MAX_OBJ, 32, 32)), jnp.zeros((1, MAX_OBJ, 2, 2, 32)))
    rng = np.random.default_rng(3)
    batch = jax.tree.map(lambda x: jnp.asarray(x[:2]), _batch(rng))
    key = jax.random.PRNGKey(7)

    def loss(params, cfg):
        vs = {**variables, "params": params}
        out = forward_sequence(model, vs, batch, key, cfg)
        return compute_losses(out, batch["cls_gt"], batch["selector"],
                              it=50, start_warm=10, end_warm=20)["total_loss"]

    cfg_p = TrainConfig(num_frames=T, num_ref_frames=2, remat=False)
    cfg_r = TrainConfig(num_frames=T, num_ref_frames=2, remat=True)
    lp, gp = jax.value_and_grad(loss)(variables["params"], cfg_p)
    lr_, gr = jax.value_and_grad(loss)(variables["params"], cfg_r)
    np.testing.assert_allclose(float(lp), float(lr_), rtol=1e-6)
    flat_p = jax.tree.leaves(gp)
    flat_r = jax.tree.leaves(gr)
    assert len(flat_p) == len(flat_r)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
