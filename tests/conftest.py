"""Test fixtures: make the read-only reference repo importable as an oracle.

The reference imports `pulp` (ILP solver) and `pycocotools` at module scope;
neither is installed in this image. We inject inert stub modules so the
reference's pure-math modules can be imported for differential testing. Tests
that would actually exercise those libraries use deva_tpu's own implementations
(deva_tpu/inference/ilp.py, deva_tpu/utils/rle.py) instead.
"""
import sys
import types

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


_stub("pulp",
      LpProblem=None, LpMaximize=None, LpVariable=None, lpSum=None,
      PULP_CBC_CMD=None, LpStatus={})
_stub("pycocotools")
_stub("pycocotools.mask", encode=None, decode=None)


# --------------------------------------------------------------------------
# suite tiering: module-level slow/differential marks so a fast tier runs
# with `pytest -m "not slow"` in ~2-3 min (VERDICT r2 #9)
# --------------------------------------------------------------------------

_SLOW_MODULES = {
    # differential vs the torch reference (minutes each)
    "test_model_parity", "test_inference_parity", "test_golden",
    "test_losses", "test_tiny_vit", "test_convert_schema",
    "test_topk_drift", "test_metrics",
    # multi-frame driver / propagation suites
    "test_batched", "test_batched_driver", "test_batched_detection",
    "test_batched_midstream",
    "test_batched_detection_driver",
    "test_step_chunk",
    "test_replay_detector", "test_ext_processors", "test_drivers_smoke",
    "test_ref_drivers_smoke",
    "test_training", "test_train_driver", "test_learning",
    "test_lt_eviction",
    "test_detection_parity", "test_consensus_associated",
    "test_object_sharding",
    # HF-model-driven suites (torch forward passes)
    "test_sam_decoder", "test_jax_sam", "test_gdino",
}
_DIFFERENTIAL_MODULES = {
    "test_model_parity", "test_inference_parity", "test_golden",
    "test_losses", "test_tiny_vit", "test_metrics", "test_topk_drift",
    "test_detection_parity", "test_consensus_associated",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)
        if mod in _DIFFERENTIAL_MODULES:
            item.add_marker(_pytest.mark.differential)
