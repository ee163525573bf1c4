"""Long-video soak: 150 frames through one InferenceCore with aggressive
long-term-memory settings, so consolidation and LT eviction fire repeatedly
(SURVEY §7 phase 4: "long-video soak test"; reference behavior anchor:
deva/inference/memory_manager.py:207-276 + kv_memory_store eviction).

Asserts the properties that make unbounded video length safe on TPU:
  - memory ring shapes reach a STEADY STATE (fixed-capacity rings stop
    growing once working memory saturates and LT hits its cap);
  - after saturation the per-frame step triggers NO new XLA compilations
    (shape-stable steady state — growth recompiles inside a serving loop
    are the classic silent throughput killer, see bench.py docstring);
  - outputs stay finite and normalized throughout.
"""
import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork

pytestmark = pytest.mark.slow


class _CompileCounter(logging.Handler):
    """Counts XLA compile log records (jax_log_compiles=True)."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.count = 0

    def emit(self, record):
        if "compil" in record.getMessage().lower():
            self.count += 1


def test_long_video_soak_steady_state():
    h = w = 64
    model = DEVANetwork(ModelConfig(pix_feat_dim=64, key_dim=16,
                                    value_dim=32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3)),
                           jnp.zeros((1, 2, h, w)),
                           jnp.zeros((1, 2, h // 16, w // 16, 32)))
    # 16 tokens/frame; write every 2 frames; consolidate every 2 writes;
    # LT cap small enough that eviction fires several times in 150 frames
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=8, max_long_term_elements=96,
                          topk_method="exact")
    core = InferenceCore(model, variables, cfg)

    rng = np.random.default_rng(0)
    mask0 = np.zeros((h, w), np.int64)
    mask0[8:36, 10:50] = 1
    mask0[44:60, 4:28] = 2

    def frame():
        return rng.standard_normal((h, w, 3)).astype(np.float32)

    counter = _CompileCounter()
    jax_logger = logging.getLogger("jax")
    old_level = jax_logger.level
    jax.config.update("jax_log_compiles", True)
    jax_logger.addHandler(counter)
    jax_logger.setLevel(logging.DEBUG)

    def ring_shapes():
        eng = core.memory
        shapes = []
        for bid, b in sorted(eng.buckets.items()):
            shapes.append((bid, b.cap, b.key.shape, b.value.shape))
        for bid, lt in sorted(eng.long_buckets.items()):
            shapes.append(("lt", bid, lt.cap, lt.value.shape))
        return shapes

    try:
        prob = core.step(frame(), mask0, objects=[1, 2])
        assert np.isfinite(np.asarray(prob)).all()
        warm_frames = 100
        for ti in range(1, warm_frames):
            prob = core.step(frame())
            if ti % 25 == 0:
                p = np.asarray(prob)
                assert np.isfinite(p).all(), ti
                np.testing.assert_allclose(p.sum(0), 1.0, rtol=1e-3)
        warm_compiles = counter.count
        assert warm_compiles > 0, \
            "compile-log capture is broken; the steady-state assertion " \
            "below would be vacuous"
        steady = ring_shapes()
        lt_sizes = [lt.size for lt in core.memory.long_buckets.values()]
        assert lt_sizes and max(lt_sizes) > 0, "LT never engaged"

        for ti in range(warm_frames, 150):
            prob = core.step(frame())
        p = np.asarray(prob)
        assert np.isfinite(p).all()
        np.testing.assert_allclose(p.sum(0), 1.0, rtol=1e-3)

        assert ring_shapes() == steady, (steady, ring_shapes())
        assert counter.count == warm_compiles, (
            f"{counter.count - warm_compiles} recompiles after frame "
            f"{warm_frames} — the steady state is not shape-stable")
        # eviction actually ran: LT stayed within its configured cap
        for lt in core.memory.long_buckets.values():
            assert lt.size <= cfg.max_long_term_elements
    finally:
        jax.config.update("jax_log_compiles", False)
        jax_logger.removeHandler(counter)
        jax_logger.setLevel(old_level)
