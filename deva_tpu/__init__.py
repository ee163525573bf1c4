"""deva_tpu: a TPU-native (JAX/XLA/Pallas) decoupled video segmentation framework.

Re-implements the capabilities of DEVA ("Tracking Anything with Decoupled Video
Segmentation", ICCV 2023) with a TPU-first design: functional state, fixed-shape
ring-buffer memory, pjit/shard_map parallelism and Pallas kernels for the hot
memory-attention path.

Reference behavior anchors are cited in docstrings as `reference:<path>:<lines>`
pointing into the upstream repo (hkchengrex/Tracking-Anything-with-DEVA).
"""

from deva_tpu.config import ModelConfig, InferenceConfig

__all__ = ["ModelConfig", "InferenceConfig"]
__version__ = "0.1.0"
