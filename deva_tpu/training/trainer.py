"""Training: the unrolled multi-frame recurrence as one jitted SPMD step.

Behavioral anchor: reference:deva/model/trainer.py:71-206 (do_pass) and
reference:deva/train.py. Differences that are TPU-native by design:
  - one pure `train_step(state, batch, it, rng)` jitted over a device mesh;
    the gradient all-reduce is a compiler-inserted psum over the 'data' axis
    (replacing DDP/NCCL)
  - BatchNorm runs with frozen running stats exactly like the reference
    (reference:trainer.py:265-270 keeps the network in eval mode)
  - random reference-frame subsampling / random deep updates use jax PRNG keys
    threaded through the step (reference:trainer.py:109-122,140)
  - bf16 compute via ModelConfig.dtype (the reference notes AMP is flaky for
    this model, reference:deva/utils/configuration.py:10-11; bf16 on TPU does
    not need loss scaling)
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from deva_tpu.config import TrainConfig
from deva_tpu.models.network import DEVANetwork
from deva_tpu.training.losses import compute_losses


class TrainState(flax.struct.PyTreeNode):
    params: Dict
    batch_stats: Dict = flax.struct.field()
    opt_state: optax.OptState = flax.struct.field()
    it: jnp.ndarray = flax.struct.field()


def make_optimizer(cfg: TrainConfig, schedule: str = "step") -> optax.GradientTransformation:
    """AdamW + grad-clip + LR schedule (constant/poly/step).
    reference:deva/model/trainer.py:43-58."""
    if schedule == "constant":
        lr = cfg.lr
    elif schedule == "poly":
        lr = lambda step: cfg.lr * (1 - step / cfg.iterations) ** 0.9
    elif schedule == "step":
        lr = optax.piecewise_constant_schedule(
            cfg.lr, {s: cfg.gamma for s in cfg.steps})
    else:
        raise NotImplementedError(schedule)
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adamw(lr, weight_decay=cfg.weight_decay),
    )


def forward_sequence(model: DEVANetwork, variables: Dict, batch: Dict,
                     rng: jax.Array, cfg: TrainConfig):
    """The unrolled recurrence (reference:trainer.py:90-153).

    batch: rgb [B,T,H,W,3]; first_frame_gt [B,max_obj,H,W] one-hot;
           cls_gt [B,T,H,W] int; selector [B,max_obj].
    Returns dict of stacked per-step outputs for the loss.
    """
    frames = batch["rgb"]
    first_gt = batch["first_frame_gt"].astype(jnp.float32)
    selector = batch["selector"]
    b, t = frames.shape[:2]
    max_obj = first_gt.shape[1]
    num_ref = cfg.num_ref_frames

    # cfg.remat: rematerialize each sub-module call (recompute-in-backward)
    # so the unrolled recurrence stores only call-boundary activations —
    # the per-device-batch enabler at stage-3 shapes. Identical math.
    if cfg.remat:
        fns = {}

        def apply(*args, method, **static_kwargs):
            key = (method, tuple(sorted(static_kwargs.items())))
            if key not in fns:
                fns[key] = jax.checkpoint(functools.partial(
                    lambda m, kws, v, *a: model.apply(v, *a, method=m, **kws),
                    method, static_kwargs))
            return fns[key](variables, *args)
    else:
        apply = functools.partial(model.apply, variables)

    ms, feat = apply(frames[:, 0], method=DEVANetwork.encode_image)
    k, s, _ = apply(feat, need_ek=False, method=DEVANetwork.transform_key)
    hq, wq = k.shape[1], k.shape[2]
    sensory = jnp.zeros((b, max_obj, hq, wq, model.config.value_dim),
                        model.config.compute_dtype)
    v16, sensory = apply(frames[:, 0], ms[0], sensory, first_gt,
                         method=DEVANetwork.encode_mask)
    masks = first_gt

    keys = [k.reshape(b, hq * wq, -1)]
    shrinkages = [s.reshape(b, hq * wq)]
    values = [v16.reshape(b, max_obj, hq * wq, -1)]

    out_logits, out_masks, out_aux = [], [], []
    for ti in range(1, t):
        rng, k_ref, k_deep = jax.random.split(rng, 3)
        ms, feat = apply(frames[:, ti], method=DEVANetwork.encode_image)
        k, s, e = apply(feat, method=DEVANetwork.transform_key)
        keys.append(k.reshape(b, hq * wq, -1))
        shrinkages.append(s.reshape(b, hq * wq))

        if ti <= num_ref:
            ref_keys = jnp.concatenate(keys[:ti], axis=1)
            ref_shrink = jnp.concatenate(shrinkages[:ti], axis=1)
            ref_values = jnp.concatenate(values[:ti], axis=2)
        else:
            # num_ref random reference frames per sample
            # (reference:trainer.py:114-122)
            all_keys = jnp.stack(keys[:ti], 1)          # [B, ti, HW, Ck]
            all_shrink = jnp.stack(shrinkages[:ti], 1)  # [B, ti, HW]
            all_values = jnp.stack(values[:ti], 2)      # [B, O, ti, HW, Cv]
            perm = jax.vmap(
                lambda kk: jax.random.permutation(kk, ti)[:num_ref])(
                    jax.random.split(k_ref, b))          # [B, R]
            take = jax.vmap(lambda a, p: a[p])
            ref_keys = take(all_keys, perm).reshape(b, num_ref * hq * wq, -1)
            ref_shrink = take(all_shrink, perm).reshape(b, num_ref * hq * wq)
            ref_values = jax.vmap(lambda a, p: a[:, p])(
                all_values, perm).reshape(b, max_obj, num_ref * hq * wq, -1)

        readout = apply(k, e, ref_keys, ref_shrink, ref_values,
                        method=DEVANetwork.read_memory)
        # selector passes positionally: under cfg.remat kwargs are static
        # (baked into the per-method wrapper); arrays must be arguments
        sensory, logits, prob, aux_logits, aux_prob = apply(
            ms, readout, sensory, masks, selector, need_aux=True,
            method=DEVANetwork.segment)
        masks = prob[:, 1:]

        if ti < t - 1:
            do_deep = jax.random.uniform(k_deep) < cfg.deep_update_prob
            v16, sensory_deep = apply(frames[:, ti], ms[0], sensory, masks,
                                      method=DEVANetwork.encode_mask)
            sensory = jnp.where(do_deep, sensory_deep, sensory)
            values.append(v16.reshape(b, max_obj, hq * wq, -1))

        out_logits.append(logits)
        out_masks.append(masks)
        out_aux.append(aux_logits)

    return {
        "logits": jnp.stack(out_logits),
        "masks": jnp.stack(out_masks),
        "aux_logits": jnp.stack(out_aux),
    }


def make_train_step(model: DEVANetwork, tx: optax.GradientTransformation,
                    cfg: TrainConfig, mesh=None):
    """Returns train_step(state, batch, rng) -> (state, metrics); jitted, and
    sharded over `mesh`'s 'data' axis when a mesh is given."""

    def loss_fn(params, batch_stats, batch, it, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs = forward_sequence(model, variables, batch, rng, cfg)
        losses = compute_losses(outputs, batch["cls_gt"], batch["selector"],
                                it, start_warm=cfg.start_warm,
                                end_warm=cfg.end_warm)
        return losses["total_loss"], losses

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.it, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  it=state.it + 1)
        return new_state, metrics

    # donate the state: callers all do `state = step(state, ...)`, and
    # without aliasing the params + AdamW moments (~4x params bytes)
    # double-buffer in HBM across every update
    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, jax.tree.map(lambda _: data, {
            "rgb": 0, "first_frame_gt": 0, "cls_gt": 0, "selector": 0}), repl),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_eval_outputs(model: DEVANetwork, cfg: TrainConfig):
    """Forward-only jitted pass returning the per-step masks, for training
    visualization grids (reference:deva/model/trainer.py:161-167)."""

    def eval_outputs(state: TrainState, batch: Dict, rng: jax.Array):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return forward_sequence(model, variables, batch, rng, cfg)

    return jax.jit(eval_outputs)


def init_train_state(model: DEVANetwork, variables: Dict,
                     tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]),
                      it=jnp.zeros((), jnp.int32))
