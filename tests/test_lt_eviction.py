"""Long-term memory eviction parity: tiny LT_max forces
remove_obsolete_features (usage-based eviction with strictly-greater
threshold, reference:deva/inference/kv_memory_store.py:164-185)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork

from helpers_ref import build_reference_deva, converted_variables

H, W = 64, 96


def test_eviction_parity():
    from deva.inference.inference_core import DEVAInferenceCore
    ref_net = build_reference_deva(seed=0)
    variables = converted_variables(ref_net)
    model = DEVANetwork(ModelConfig())

    # LT_max=48, P=16 -> eviction when lt_size >= 32; consolidation every
    # 2 memory frames (T_max=4, T_min=2, mem_every=1)
    rc = {"pix_feat_dim": 512, "key_dim": 64, "value_dim": 512,
          "mem_every": 1, "top_k": 8, "chunk_size": -1,
          "enable_long_term": True, "enable_long_term_count_usage": True,
          "max_mid_term_frames": 4, "min_mid_term_frames": 2,
          "num_prototypes": 16, "max_long_term_elements": 40}
    oc = InferenceConfig(
        mem_every=1, top_k=8, enable_long_term=True,
        enable_long_term_count_usage=True, max_mid_term_frames=4,
        min_mid_term_frames=2, num_prototypes=16, max_long_term_elements=40)

    rng = np.random.default_rng(21)
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    frames = [np.kron(base + 0.1 * rng.standard_normal((H // 8, W // 8, 3)),
                      np.ones((8, 8, 1))).astype(np.float32)
              for _ in range(16)]
    mask0 = np.zeros((H, W), np.int64)
    mask0[8:28, 10:40] = 1

    ref_core = DEVAInferenceCore(ref_net, config=rc)
    our_core = InferenceCore(model, variables, oc)

    with torch.no_grad():
        for ti, img in enumerate(frames):
            t_img = torch.from_numpy(np.moveaxis(img, -1, 0)).contiguous()
            if ti == 0:
                rp = ref_core.step(t_img, torch.from_numpy(mask0),
                                   objects=[1])
                op = our_core.step(img, mask0, objects=[1])
            else:
                rp = ref_core.step(t_img)
                op = our_core.step(img)
            r, o = rp.numpy(), np.asarray(op)
            bad = (np.abs(o - r) > 5e-3).any(axis=0)
            assert bad.mean() <= 0.01, f"frame {ti}: {bad.mean():.2%}"

    # eviction must actually have happened, and LT sizes must agree
    (bid, lt), = our_core.memory.long_buckets.items()
    ref_lt = ref_core.memory.long_mem
    ref_sizes = {b: ref_lt.size(b) for b in ref_lt.buckets}
    assert lt.size == list(ref_sizes.values())[0]
    assert lt.size <= 40
    # keys of the surviving tokens match (same eviction decisions)
    ref_keys = list(ref_lt.key.values())[0].numpy().T  # [N, Ck]
    np.testing.assert_allclose(np.asarray(lt.key[:lt.size]), ref_keys,
                               atol=5e-3)


def _mini_frames(rng, t):
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    return [np.kron(base + 0.1 * rng.standard_normal((H // 8, W // 8, 3)),
                    np.ones((8, 8, 1))).astype(np.float32)
            for _ in range(t)]


def _mask0():
    m = np.zeros((H, W), np.int64)
    m[8:28, 10:40] = 1
    m[36:60, 50:90] = 2
    return m


def test_lazy_lt_capacity_growth_equals_full():
    """The long-term ring allocates lazily (4*P, doubled on demand,
    memory.py:_compress); results must equal a ring sized to
    max_long_term_elements from the first consolidation. Shapes chosen so
    TWO growth steps fire (8 -> 16 -> 32) during the run."""
    import jax
    import jax.numpy as jnp
    from deva_tpu.inference import memory as memmod

    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(
        mem_every=1, top_k=8, enable_long_term=True,
        enable_long_term_count_usage=True, max_mid_term_frames=3,
        min_mid_term_frames=1, num_prototypes=2, max_long_term_elements=64,
        topk_method="exact")

    rng = np.random.default_rng(31)
    t = 26  # consolidations every 2 writes after saturation -> lt_size > 16
    frames = _mini_frames(rng, t)
    mask0 = _mask0()

    def run(full_capacity):
        if full_capacity:
            orig = memmod._round_up

            def patched(x, m):
                # inflate only the initial 4*P LT allocation
                if (x, m) == (4 * cfg.num_prototypes, cfg.num_prototypes):
                    return orig(cfg.max_long_term_elements, m)
                return orig(x, m)
            memmod._round_up = patched
        try:
            core = InferenceCore(model, variables, cfg)
            core.step(frames[0], mask0, objects=[1, 2])
            probs = [np.asarray(core.step(f)) for f in frames[1:]]
        finally:
            if full_capacity:
                memmod._round_up = orig
        (bid, _), = core.memory.buckets.items()
        return probs, core.memory.long_buckets[bid]

    probs_lazy, lt_lazy = run(False)
    probs_full, lt_full = run(True)

    assert lt_lazy.size == lt_full.size and lt_lazy.size > 16, lt_lazy.size
    assert lt_lazy.cap < lt_full.cap, (lt_lazy.cap, lt_full.cap)
    np.testing.assert_allclose(
        np.asarray(lt_lazy.key[:lt_lazy.size], np.float32),
        np.asarray(lt_full.key[:lt_full.size], np.float32),
        atol=1e-5)
    for ti, (a, b) in enumerate(zip(probs_lazy, probs_full)):
        # different ring capacities compile different padded-shape programs
        # whose op schedules differ by float noise on masked-slot math
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f"frame {ti}")


def test_lazy_lt_capacity_growth_batched():
    """Same property for the batched stacked LT rings
    (batched.py:_maybe_consolidate growth)."""
    import jax
    import jax.numpy as jnp
    from deva_tpu.inference.batched import BatchedPropagator

    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(
        mem_every=1, top_k=8, enable_long_term=True,
        enable_long_term_count_usage=True, max_mid_term_frames=3,
        min_mid_term_frames=1, num_prototypes=2, max_long_term_elements=64,
        topk_method="exact")
    rng = np.random.default_rng(32)
    t = 26
    vids = [_mini_frames(rng, t), _mini_frames(rng, t)]
    mask0 = _mask0()

    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([v[0] for v in vids], [mask0] * 2, [[1, 2]] * 2)
    cap0 = bp.lt_key.shape[1]
    for ti in range(1, t):
        bp.step_all([v[ti] for v in vids])
    assert (bp.lt_sizes > 16).all()
    assert bp.lt_key.shape[1] > cap0, "LT ring growth never fired"

    # parity against the sequential lazy path
    core = InferenceCore(model, variables, cfg)
    core.step(vids[0][0], mask0, objects=[1, 2])
    for ti in range(1, t):
        core.step(vids[0][ti])
    (bid, _), = core.memory.buckets.items()
    lt = core.memory.long_buckets[bid]
    assert int(bp.lt_sizes[0]) == lt.size
    np.testing.assert_allclose(
        np.asarray(bp.lt_key[0, :lt.size], np.float32),
        np.asarray(lt.key[:lt.size], np.float32), atol=5e-3)


def test_consolidation_window_smaller_than_prototypes():
    """Tiny frames can make the candidate window smaller than
    num_prototypes; the prototype top-k clamps to the window instead of
    crashing (the reference's torch.topk would error here)."""
    import jax, jax.numpy as jnp
    model = DEVANetwork(ModelConfig(pix_feat_dim=64, key_dim=16,
                                    value_dim=32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 32)))
    # 64x96 -> hw=24 tokens; window=(4-2)*24=48 < num_prototypes=64
    cfg = InferenceConfig(mem_every=1, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=64, max_long_term_elements=1000,
                          topk_method="exact")
    rng = np.random.default_rng(31)
    mask0 = np.zeros((H, W), np.int64)
    mask0[10:40, 20:70] = 1
    core = InferenceCore(model, variables, cfg)
    core.step(rng.standard_normal((H, W, 3)).astype(np.float32), mask0,
              objects=[1])
    for _ in range(6):  # past the max_work trigger (4 frames of tokens)
        core.step(rng.standard_normal((H, W, 3)).astype(np.float32))
    (_, lt), = core.memory.long_buckets.items()
    # trigger at frames 4 and 6 (after the first sieve the ring refills in
    # 2 writes): two consolidations, each appending the clamped P == 48
    assert lt.size == 96, lt.size
