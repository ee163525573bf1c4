"""deva_tpu: a TPU-native (JAX/XLA/Pallas) decoupled video segmentation framework.

Re-implements the capabilities of DEVA ("Tracking Anything with Decoupled Video
Segmentation", ICCV 2023) with a TPU-first design: functional state, fixed-shape
ring-buffer memory, pjit/shard_map parallelism and Pallas kernels for the hot
memory-attention path.

Reference behavior anchors are cited in docstrings as `reference:<path>:<lines>`
pointing into the upstream repo (hkchengrex/Tracking-Anything-with-DEVA).
"""

from deva_tpu.config import ModelConfig, InferenceConfig

# Heavier entry points are exported lazily so `import deva_tpu` stays cheap
# (pulling flax/optax eagerly slows every CLI start on the one-core host).
_LAZY = {
    "DEVANetwork": "deva_tpu.models.network",
    "InferenceCore": "deva_tpu.inference.core",
    "BatchedPropagator": "deva_tpu.inference.batched",
    "BatchedDetectionPropagator": "deva_tpu.inference.batched_detection",
    "MemoryEngine": "deva_tpu.inference.memory",
    "ObjectManager": "deva_tpu.inference.object_manager",
    "ObjectInfo": "deva_tpu.inference.object_info",
    "ResultSaver": "deva_tpu.inference.result_saver",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))


__all__ = ["ModelConfig", "InferenceConfig", *_LAZY]
__version__ = "0.1.0"
