"""Typed configuration for deva_tpu.

The reference threads a flat mutable argparse dict through every layer
(reference:deva/utils/configuration.py, deva/inference/eval_args.py). Here we use
frozen dataclasses so configs are hashable (usable as static jit args) and typed.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def _backend_is_tpu() -> bool:
    """Resolution point for the 'auto' dtype defaults (monkeypatched in
    tests/test_amp.py to exercise the TPU-default resolution on CPU)."""
    import jax
    return jax.default_backend() == "tpu"


def resolve_dtype(name: str) -> str:
    """'auto' -> 'bfloat16' on TPU, 'float32' elsewhere; other names pass
    through. The shipped defaults ARE the benched configuration on TPU
    (BENCH_r04: bf16 compute + bf16 rings; drift bounded in
    tests/test_amp.py), while CPU (tests, differential parity) stays f32."""
    if name == "auto":
        return "bfloat16" if _backend_is_tpu() else "float32"
    return name


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters.

    Defaults match reference:deva/inference/eval_args.py:20-22 and
    reference:deva/utils/configuration.py:25-27.
    """
    pix_feat_dim: int = 512
    key_dim: int = 64
    value_dim: int = 512
    # sensory dim == value dim (reference:deva/inference/memory_manager.py:19)

    # Compute dtype for the conv backbones / decoder. Params are always f32.
    # Attention similarity/softmax, logit aggregation and the final prediction
    # conv stay in f32 regardless (reference keeps f32 islands:
    # reference:deva/model/network.py:33-40, big_modules.py:189-190).
    # 'auto' = bfloat16 on TPU (the benched serving default), f32 elsewhere.
    dtype: str = "auto"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if resolve_dtype(self.dtype) == "bfloat16" \
            else jnp.float32


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Inference-time knobs. Defaults match reference:deva/inference/eval_args.py:25-56
    and reference:deva/ext/ext_eval_args.py:45-86."""
    mem_every: int = 5
    top_k: int = 30
    # long-term memory (XMem-style)
    enable_long_term: bool = True
    enable_long_term_count_usage: bool = False
    max_mid_term_frames: int = 10    # T_max
    min_mid_term_frames: int = 5     # T_min
    num_prototypes: int = 128        # P
    max_long_term_elements: int = 10000  # LT_max

    # image sizing: resize shorter side to `size` (-1 keeps original)
    size: int = 480

    # detection-fusion knobs
    max_missed_detection_count: int = 10
    max_num_objects: int = -1        # -1 = unbounded
    detection_every: int = 5
    num_voting_frames: int = 3

    # Fused Pallas attention (deva_tpu/ops/pallas_attention.py): similarity
    # + masked top-k + softmax + readout with no dense [Q, N] affinity in
    # HBM (SURVEY §2.7-1). 'auto' = on for TPU; the resolved topk_method +
    # a MEASURED shape policy select the impl — 'exact' -> attend_pallas
    # (reference top-k semantics, bitwise parity); 'approx' (the TPU
    # serving default) -> XLA threshold-dense below
    # FusedStepper.PALLAS_MIN_TOKENS ring tokens (measured faster there:
    # 2.98 vs 5.37 ms/frame at the default 16.9k-token serving shape —
    # the one materialized [Q, N] similarity costs less than the fused
    # path's three in-VMEM similarity rebuilds), attend_pallas_approx
    # above (threshold support ⊇ exact top-k; drift bounded in
    # tests/test_topk_drift.py). Parity in tests/test_pallas_attention.py.
    use_pallas_attention: object = "auto"

    def resolve_use_pallas(self):
        """-> False (XLA paths only), True (fused kernels FORCED for both
        top-k methods), or 'auto' (fused for 'exact'; for 'approx' the
        measured shape policy in FusedStepper picks XLA threshold-dense at
        DEVA-sized rings — see FusedStepper.PALLAS_MIN_TOKENS)."""
        if self.use_pallas_attention == "auto":
            import jax
            return "auto" if jax.default_backend() == "tpu" else False
        return bool(self.use_pallas_attention)

    # top-k selection for the memory readout: 'exact' (sort-based, bit-parity
    # with the reference), 'approx' (lax.approx_max_k threshold — the TPU's
    # native PartialReduce, ~11x faster at serving shapes; the support
    # provably contains the exact top-k), or 'auto' = approx on TPU, exact
    # elsewhere. See deva_tpu/ops/memory_attention.py:topk_softmax.
    topk_method: str = "auto"

    # Single-stream block stepping (InferenceCore.step_chunk) can
    # restructure the per-memory-period block so all K frames' encoders run
    # as ONE conv batch and the ring attention sees K*Q query rows, ahead
    # of a decode-only lax.scan (FusedStepper._raw_block_preenc) — the
    # rings are loop-invariant within a block, so this is mathematically
    # exact; only float op-scheduling noise differs (bounded in
    # tests/test_step_chunk). MEASURED NEUTRAL on v5e (11.36 -> 11.26
    # ms/frame at the 480p/16.2k-token serving shape,
    # scripts/probe_preenc.py): the per-frame program is HBM-bandwidth
    # bound, so batching frames buys no efficiency — same reason
    # single-stream fps ~= aggregate/16 (docs/PERFORMANCE.md). Default
    # False keeps the per-frame scan body, whose in-block compute order
    # matches step() exactly. The vmapped batched propagators ignore this
    # (their video axis already fills the device).
    preencode_blocks: bool = False

    # dtype of the memory rings (keys/values). bfloat16 halves ring HBM and
    # feeds the MXU natively; similarity still accumulates in f32.
    # 'auto' = bfloat16 on TPU (the benched serving default), f32 elsewhere.
    ring_dtype: str = "auto"

    @property
    def ring_jnp_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if resolve_dtype(self.ring_dtype) == "bfloat16" \
            else jnp.float32

    # object-axis padding buckets: device tensors over the object axis are padded
    # up to the next entry so frame-to-frame steps never retrace as objects churn.
    # (3 is a first-class bucket: DAVIS-style videos average 2-3 objects and
    # the decoder/mask-encoder cost scales linearly with the padded count)
    obj_pad_buckets: tuple = (1, 2, 3, 4, 8, 16, 32, 64, 128, 256)

    def pad_objects(self, n: int) -> int:
        for b in self.obj_pad_buckets:
            if n <= b:
                return b
        return n  # beyond the largest bucket: exact (rare)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (per-stage values:
    reference:deva/utils/configuration.py:45-64)."""
    batch_size: int = 16
    num_frames: int = 8
    num_ref_frames: int = 3
    lr: float = 1e-5
    weight_decay: float = 0.05
    iterations: int = 150_000
    steps: tuple = (120_000, 140_000)
    gamma: float = 0.1
    clip_grad_norm: float = 3.0
    deep_update_prob: float = 0.2
    max_num_obj: int = 3
    # bootstrapped CE schedule (reference:deva/model/losses.py:24-45)
    start_warm: int = 20_000
    end_warm: int = 70_000
    amp_dtype: str = "bfloat16"
    # rematerialize each sub-module call in the unrolled recurrence
    # (jax.checkpoint): activations are recomputed in the backward pass
    # instead of stored, trading ~1/3 extra FLOPs for an O(num_frames)
    # cut in activation HBM — the enabler for larger per-device batches
    # at stage-3 shapes (8 frames, 384p). Numerically identical.
    remat: bool = False


def flat_config(model: ModelConfig = ModelConfig(),
                infer: InferenceConfig = InferenceConfig()) -> dict:
    """A reference-style flat dict view, for drivers that want parity with the
    reference's config plumbing."""
    d = dataclasses.asdict(model)
    d.update(dataclasses.asdict(infer))
    return d
