"""Differential test: compute_losses vs the reference LossComputer
(reference:deva/model/losses.py:54-78) on random logits, B>1,
heterogeneous per-sample difficulty, after warmup — catches the
per-sample-vs-global top-p selection distinction."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from deva_tpu.training.losses import compute_losses

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.mark.parametrize("it", [5, 15, 50])
def test_losses_match_reference(it):
    import torch
    from deva.model.losses import LossComputer

    rng = np.random.default_rng(42)
    b, t, h, w, max_obj = 3, 3, 16, 16, 2
    c = max_obj + 1
    # heterogeneous difficulty: scale sample 0's logits up (easy), 2's down
    scale = np.array([4.0, 1.0, 0.25])[:, None, None, None]
    logits = [rng.standard_normal((b, c, h, w)).astype(np.float32) * scale
              for _ in range(t - 1)]
    aux_logits = [rng.standard_normal((b, c, h, w)).astype(np.float32)
                  for _ in range(t - 1)]
    cls_gt = rng.integers(0, c, (b, t, h, w)).astype(np.int64)
    masks = [np.clip(rng.uniform(0, 1, (b, max_obj, h, w)), 0, 1)
             .astype(np.float32) for _ in range(t - 1)]

    data = {"rgb": torch.zeros(b, t, 3, h, w),
            "cls_gt": torch.from_numpy(cls_gt)[:, :, None]}
    for i in range(t - 1):
        data[f"logits_{i+1}"] = torch.from_numpy(logits[i])
        data[f"aux_logits_{i+1}"] = torch.from_numpy(
            aux_logits[i][:, :, None])
        data[f"masks_{i+1}"] = torch.from_numpy(masks[i])

    ref = LossComputer({"start_warm": 10, "end_warm": 30})
    with torch.no_grad():
        ref_losses = ref.compute(data, num_objects=[max_obj] * b, it=it)

    outputs = {"logits": jnp.asarray(np.stack(logits)),
               "aux_logits": jnp.asarray(np.stack(aux_logits)),
               "masks": jnp.asarray(np.stack(masks))}
    ours = compute_losses(outputs, jnp.asarray(cls_gt.astype(np.int32)),
                          jnp.ones((b, max_obj), np.float32), it,
                          start_warm=10, end_warm=30)

    for key in ["ce_loss_1", "ce_loss_2", "aux_loss_1", "aux_loss_2",
                "dice_loss_1", "dice_loss_2", "p", "total_loss"]:
        ref_v = float(ref_losses[key])
        our_v = float(ours[key])
        assert abs(ref_v - our_v) < 2e-4 * max(1.0, abs(ref_v)), \
            (key, ref_v, our_v)
