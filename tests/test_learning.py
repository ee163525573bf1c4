"""End-to-end learning: the training stack must produce a model that
actually TRACKS when served by the real inference stack.

Tiny-dim DEVA, trained from scratch on synthetic moving-square clips with
the production train step (data-parallel over the 8-device CPU mesh, full
unrolled recurrence, bootstrapped CE + dice + aux losses, AdamW), then
evaluated with InferenceCore (ring memory, top-k attention) on held-out
clips. This is the evidence layer above test_training.py's
"loss decreases on a repeated batch": generalization to unseen videos
through the serve path.

Calibration (fixed seeds, 8-device CPU mesh): random-init IoU 0.06;
after 120 steps IoU 0.93 (loss 34.7 -> 0.24). The test trains 100 steps
and asserts a wide margin under that trajectory.
"""
import numpy as np
import pytest

import jax


def test_trains_to_track():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    from deva_tpu.training.toy import eval_iou, tiny_model, train_toy

    model = tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 32, 32, 3)),
        jax.numpy.zeros((1, 1, 32, 32)), jax.numpy.zeros((1, 1, 2, 2, 32)))
    iou_random = eval_iou(model, variables, n_clips=2)

    model, trained, losses = train_toy(steps=100, log=lambda *_: None)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.25 * losses[0], losses

    iou_trained = eval_iou(model, trained, n_clips=2)
    assert iou_trained > 0.5, (iou_trained, iou_random)
    assert iou_trained > iou_random + 0.3, (iou_trained, iou_random)
