"""Device-mesh helpers for SPMD training/eval.

The reference scales with DDP/NCCL (reference:deva/train.py:22,
deva/model/trainer.py:27-30); here the same data parallelism is a
`jax.sharding.Mesh` with the batch sharded over the 'data' axis — XLA inserts
the gradient psum over ICI. The 'model' axis is available for sharding the
(embarrassingly parallel) object axis of grouped tensors when object counts
are large (reference:deva/model/group_modules.py:6-7 notes permutation
equivariance over objects).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Shard every array's leading (batch) axis over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
