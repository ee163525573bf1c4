"""Learn-to-track on synthetic data: the end-to-end train -> serve loop.

The reference repo has no self-contained proof that its training stack
produces a model that tracks (training requires the full DAVIS/YTVOS
download, reference:docs/TRAINING.md). This module provides one: tiny-dim
DEVA trained from scratch on procedurally generated moving-square clips
(data-parallel over the device mesh, the real unrolled-recurrence train
step), then evaluated with the real serving stack (InferenceCore ring
memory) on held-out clips.

Measured on the 8-device virtual CPU mesh (seeds fixed): mean propagation
IoU over 4 held-out frames goes 0.06 (random init) -> 0.93 after 120 steps.
Driven by tests/test_learning.py and scripts/train_toy.py.

Hyperparameter note: the bootstrapped-CE hard-pixel mining schedule must
stay in its full-CE phase for a run this short — with the warmup compressed
to ~10 steps the model plateaus in a background-only collapse (top-p mining
on a collapsed prediction keeps reinforcing it). The reference warms up over
10k-iteration scales (reference:deva/model/losses.py:24-45); train_toy sets
start_warm far beyond the run length instead.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def make_clip(rng: np.random.Generator, t: int, h: int = 48, w: int = 48,
              size: int = 12) -> Tuple[np.ndarray, np.ndarray]:
    """One synthetic clip: a bright square moving linearly (clamped at the
    borders) over a fixed blocky dark background with per-frame pixel noise.
    Returns (frames [t, h, w, 3] float32, masks [t, h, w] int32 in {0, 1})."""
    bg = np.kron(rng.uniform(0, 0.6, (h // 8, w // 8, 3)), np.ones((8, 8, 1)))
    x = int(rng.integers(0, w - size))
    y = int(rng.integers(0, h - size))
    dx, dy = int(rng.integers(-3, 4)), int(rng.integers(-3, 4))
    color = rng.uniform(0.7, 1.0, 3)
    frames, masks = [], []
    for _ in range(t):
        img = bg + 0.02 * rng.standard_normal((h, w, 3))
        img[y:y + size, x:x + size] = color
        m = np.zeros((h, w), np.int32)
        m[y:y + size, x:x + size] = 1
        frames.append(img.astype(np.float32))
        masks.append(m)
        x = int(np.clip(x + dx, 0, w - size))
        y = int(np.clip(y + dy, 0, h - size))
    return np.stack(frames), np.stack(masks)


def make_batch(rng: np.random.Generator, b: int, t: int, h: int = 48,
               w: int = 48, size: int = 12) -> Dict[str, np.ndarray]:
    """Trainer-format batch (same keys as VOSDataset: rgb / first_frame_gt /
    cls_gt / selector)."""
    rgbs, gts = zip(*[make_clip(rng, t, h, w, size) for _ in range(b)])
    rgb = np.stack(rgbs)
    cls_gt = np.stack(gts)
    first = (cls_gt[:, 0] == 1)[:, None].astype(np.float32)
    selector = np.ones((b, 1), np.float32)
    return {"rgb": rgb, "first_frame_gt": first, "cls_gt": cls_gt,
            "selector": selector}


def tiny_model():
    from deva_tpu.config import ModelConfig
    from deva_tpu.models.network import DEVANetwork
    return DEVANetwork(ModelConfig(pix_feat_dim=64, key_dim=16,
                                   value_dim=32))


def eval_iou(model, variables, n_clips: int = 3, t: int = 5,
             seed: int = 999, h: int = 48, w: int = 48,
             size: int = 12) -> float:
    """Serve held-out clips with the real inference stack: first-frame mask
    in, propagate, mean IoU over the remaining frames."""
    from deva_tpu.config import InferenceConfig
    from deva_tpu.inference.core import InferenceCore
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False)
    rng = np.random.default_rng(seed)
    ious = []
    for _ in range(n_clips):
        frames, masks = make_clip(rng, t, h, w, size)
        core = InferenceCore(model, variables, cfg)
        core.step(frames[0], masks[0], objects=[1])
        for ti in range(1, t):
            p = np.asarray(core.step(frames[ti]))
            pred = p.argmax(0) == 1
            gt = masks[ti] == 1
            ious.append((pred & gt).sum() / max(1, (pred | gt).sum()))
    return float(np.mean(ious))


def train_toy(steps: int = 120, b: int = 8, t: int = 4, lr: float = 3e-4,
              n_data: int = None, seed: int = 0, log_every: int = 10,
              log=print, model=None, h: int = 48, w: int = 48,
              size: int = 12, remat: bool = False):
    """Train DEVA from scratch on moving squares; returns
    (model, {"params", "batch_stats"} variables, [per-log-step total_loss]).
    Default model is the tiny-dim one; pass a full-width DEVANetwork (and a
    larger h/w/size) for the production-shape proof
    (scripts/train_fullwidth_proof.py)."""
    import jax
    import jax.numpy as jnp
    from deva_tpu.config import TrainConfig
    from deva_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from deva_tpu.training.trainer import (init_train_state, make_optimizer,
                                           make_train_step)

    if model is None:
        model = tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 1, 32, 32)),
        jnp.zeros((1, 1, 2, 2, model.config.value_dim)))
    # start_warm >> steps: keep the bootstrapped CE in its full-CE phase
    # (see module docstring).
    cfg = TrainConfig(num_frames=t, num_ref_frames=2, lr=lr,
                      start_warm=10 ** 6, end_warm=2 * 10 ** 6,
                      iterations=10 * steps, steps=(8 * steps, 9 * steps),
                      remat=remat)
    tx = make_optimizer(cfg, schedule="step")
    if n_data is None:
        n_data = len(jax.devices())
    mesh = make_mesh(n_data, 1)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    state = replicate(mesh, init_train_state(model, variables, tx))

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    losses = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(
            state, shard_batch(mesh, make_batch(rng, b, t, h, w, size)), sub)
        if i % log_every == 0 or i == steps - 1:
            loss = float(metrics["total_loss"])
            losses.append(loss)
            log(f"step {i}: total_loss {loss:.4f}")
    trained = {"params": jax.device_get(state.params),
               "batch_stats": jax.device_get(state.batch_stats)}
    return model, trained, losses
