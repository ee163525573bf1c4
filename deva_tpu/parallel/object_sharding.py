"""Object-axis ('model' mesh axis) sharding for many-object serving.

SURVEY §2.8 TP row: the reference has no tensor parallelism; its object
dimension is embarrassingly parallel — the grouped modules are permutation
equivariant over objects (reference:deva/model/group_modules.py:6-7) and the
`chunk_size` loops are sequential stand-ins for that parallelism
(reference:deva/model/big_modules.py:99,178,
reference:deva/inference/memory_manager.py:154-159). The TPU-native
equivalent is to shard the object axis of the serving state over a `model`
mesh axis and let XLA's SPMD partitioner split the grouped decoder, mask
encoder and value-ring readout across chips, inserting the one cross-object
collective the math actually needs (the background product inside
`aggregate_logits` and the attention usage sum).

No kernel changes are involved — this is placement only:
  - per-object state is sharded on its object axis: sensory [O, h, w, C],
    last_mask [O, H, W], value rings [cap, O, Cv];
  - token-axis state (keys, shrinkage, usage counters) and the weights are
    replicated;
  - everything else (frames, scalars) is replicated on entry.

`InferenceCore(obj_mesh=...)` applies `place_object_state` every frame:
`jax.device_put` with the sharding an array already has is a no-op, so the
steady-state cost is a metadata check. Useful when the padded object count
is large (automatic / text mode runs up to max_num_objects=200,
reference:deva/ext/ext_eval_args.py); DAVIS-sized videos (<=4 objects)
should stay single-chip.

Equivalence vs the unsharded path is tested on the CPU mesh
(tests/test_object_sharding.py).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def object_specs(mesh: Mesh, axis: str = "model"):
    """-> (replicated, object-axis-first, object-axis-second) shardings."""
    return (NamedSharding(mesh, P()),
            NamedSharding(mesh, P(axis)),
            NamedSharding(mesh, P(None, axis)))


def place_object_state(core) -> None:
    """Place an InferenceCore's device state for object-axis sharding.

    Idempotent and cheap when already placed; call once per frame (the core
    does this itself when constructed with obj_mesh=...). Host-side events
    that rebuild arrays (capacity growth, purge, consolidation) are healed
    on the next call.
    """
    mesh, axis = core._obj_mesh, core._obj_axis
    if mesh is None:
        return
    rep, o_first, o_second = object_specs(mesh, axis)
    n_shards = mesh.shape[axis]
    put = jax.device_put

    def put_obj(x, obj_dim, spec):
        # explicit shardings need divisibility; the core rounds o_cap up to
        # the axis size (_ensure_capacity), but state built before the mesh
        # was attached (or with exotic pad buckets) falls back to replicated
        return put(x, spec if x.shape[obj_dim] % n_shards == 0 else rep)

    if core.last_mask is not None:
        core.last_mask = put_obj(core.last_mask, 0, o_first)
    mem = core.memory
    if mem is None:
        return
    if mem.sensory is not None:
        mem.sensory = put_obj(mem.sensory, 0, o_first)
    for store in (mem.buckets, mem.long_buckets):
        for b in store.values():
            b.key = put(b.key, rep)
            b.shrinkage = put(b.shrinkage, rep)
            if getattr(b, "selection", None) is not None:
                b.selection = put(b.selection, rep)
            b.value = put_obj(b.value, 1, o_second)
            if b.use_cnt is not None:
                b.use_cnt = put(b.use_cnt, rep)
                b.life_cnt = put(b.life_cnt, rep)
