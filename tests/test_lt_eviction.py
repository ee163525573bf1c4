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
