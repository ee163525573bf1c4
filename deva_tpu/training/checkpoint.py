"""Checkpoint / resume with orbax; weights-only export as .npz.

Behavioral anchor: reference:deva/model/trainer.py:208-263 (two artifact
kinds: weights-only `save_network` and full `{it, network, optimizer}`
checkpoints). The TPU build uses orbax for the full train state and a flat
.npz for portable weights (loadable by deva_tpu/inference/eval_args.py).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_network(state, save_path: str, it: int) -> str:
    """Weights-only export -> {save_path}_{it//1000}K.npz."""
    from flax.traverse_util import flatten_dict
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    out = f"{save_path}_{it // 1000}K.npz"
    flat = flatten_dict({"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)})
    np.savez(out, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    print(f"Network saved to {out}.")
    return out


def save_checkpoint(state, save_path: str, it: int) -> str:
    """Full train state via orbax -> {save_path}_checkpoint/{it}."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(f"{save_path}_checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        mngr.save(it, args=ocp.args.StandardSave(jax.device_get(state)))
        mngr.wait_until_finished()
    print(f"Checkpoint saved to {ckpt_dir}/{it}.")
    return ckpt_dir


def load_checkpoint(template_state, ckpt_dir: str,
                    step: Optional[int] = None):
    """Restore a full train state; returns (state, it)."""
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        if step is None:
            step = mngr.latest_step()
        state = mngr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(
                template_state)))
    print("Network weights, optimizer states, and step loaded.")
    return state, int(step)


def load_network_weights(path: str):
    """Load weights-only (.npz from save_network, or a reference .pth via the
    converter). Returns {'params': ..., 'batch_stats': ...}."""
    from flax.traverse_util import unflatten_dict
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        tree = unflatten_dict({tuple(k.split("/")): v
                               for k, v in flat.items()})
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    from deva_tpu.models.convert import load_torch_checkpoint
    return load_torch_checkpoint(path)
