"""bench.py --detection machinery smoke (tiny model, CPU).

The detection-fusion bench leg (bench.bench_detection) drives the flagship
semi-online pipeline — buffered voting frames, in-clip consensus with the
exact ILP, per-video incorporate_detection, batched buffer propagation and
block spans through BatchedDetectionPropagator, LT on — exactly as
evaluation/eval_with_detections_batched.py:run_group does. This pins the
leg's mechanics so the recorded BENCH artifact can't silently rot: warmup
must actually engage long-term memory, windows must return positive
finite times, and the machine must survive object churn (random-init masks
never match detections, so pokes/purges/new-bucket paths all fire).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bench
from deva_tpu.config import InferenceConfig
from deva_tpu.training.toy import tiny_model


@pytest.mark.slow
def test_bench_detection_leg_runs_lt_on():
    model = tiny_model()
    cv = model.config.value_dim
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, cv)))
    cfg = InferenceConfig(top_k=8, mem_every=2, max_mid_term_frames=3,
                          min_mid_term_frames=1, num_prototypes=4)
    fps, windows = bench.bench_detection(
        model, variables, cfg, batch=2, h=64, w=96, n_det_objects=3,
        warm_cycles=4, cycles_per_window=1, windows=2)
    assert fps > 0 and np.isfinite(fps)
    assert len(windows) == 2 and all(t > 0 for t in windows)


def test_det_masks_layout():
    rng = np.random.default_rng(0)
    for n in (1, 3, 4, 8, 16):
        m, info = bench._det_masks(rng, 96, 160, n, shift=7)
        assert set(np.unique(m)) == set(range(n + 1)), n
        assert [d["id"] for d in info] == list(range(1, n + 1))
