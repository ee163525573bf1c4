"""Differential tests: DEVANetwork (flax) vs the reference DEVA (torch CPU)
with identical (converted) weights on random inputs.

This validates the whole model stack module-by-module: pixel encoder
(ResNet-50), key projection, mask encoder (ResNet-18 + fusion + sensory GRU),
dense memory readout, and the mask decoder + aggregation + upsampling.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from deva_tpu.config import ModelConfig
from deva_tpu.models.network import DEVANetwork

from helpers_ref import (build_reference_deva, converted_variables,
                         rand_image, to_torch_nchw, to_np_nhwc, tree_shapes)

B, O, H, W = 1, 2, 64, 96
h, w = H // 16, W // 16


@pytest.fixture(scope="module")
def nets():
    ref = build_reference_deva(seed=0)
    variables = converted_variables(ref)
    model = DEVANetwork(ModelConfig())
    return ref, model, variables


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_converted_tree_matches_init_tree(nets, rng):
    ref, model, variables = nets
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    want = tree_shapes(init_vars["params"])
    got = tree_shapes(variables["params"])
    assert want == got, (
        f"missing: {sorted(set(want) - set(got))[:10]}, "
        f"extra: {sorted(set(got) - set(want))[:10]}")
    want_bs = tree_shapes(init_vars["batch_stats"])
    got_bs = tree_shapes(variables["batch_stats"])
    assert want_bs == got_bs


def _encode_image_both(nets, rng):
    ref, model, variables = nets
    img = rand_image(rng, B, H, W)
    with torch.no_grad():
        (rf16, rf8, rf4), rkey_feat = ref.encode_image(to_torch_nchw(img))
    ms, key_feat = model.apply(variables, jnp.asarray(img),
                               method=DEVANetwork.encode_image)
    return img, (rf16, rf8, rf4, rkey_feat), (ms, key_feat)


def test_encode_image_parity(nets, rng):
    _, refs, ours = _encode_image_both(nets, rng)
    rf16, rf8, rf4, rkey_feat = refs
    (f16, f8, f4), key_feat = ours
    for name, r, o in [("f16", rf16, f16), ("f8", rf8, f8), ("f4", rf4, f4),
                       ("key_feat", rkey_feat, key_feat)]:
        np.testing.assert_allclose(np.asarray(o), to_np_nhwc(r),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_transform_key_parity(nets, rng):
    ref, model, variables = nets
    feat = rng.standard_normal((B, h, w, 512)).astype(np.float32)
    with torch.no_grad():
        rk, rs, re = ref.transform_key(to_torch_nchw(feat))
    k, s, e = model.apply(variables, jnp.asarray(feat),
                          method=DEVANetwork.transform_key)
    np.testing.assert_allclose(np.asarray(k), to_np_nhwc(rk), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), to_np_nhwc(rs), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(e), to_np_nhwc(re), rtol=1e-3,
                               atol=1e-4)


def test_encode_mask_parity(nets, rng):
    ref, model, variables = nets
    img = rand_image(rng, B, H, W)
    f16 = rng.standard_normal((B, h, w, 512)).astype(np.float32)
    sensory = rng.standard_normal((B, O, h, w, 512)).astype(np.float32)
    masks = rng.uniform(0, 1, (B, O, H, W)).astype(np.float32)

    with torch.no_grad():
        rv, rh = ref.encode_mask(
            to_torch_nchw(img),
            [torch.from_numpy(np.moveaxis(f16, -1, -3)).contiguous()],
            torch.from_numpy(np.moveaxis(sensory, -1, -3)).contiguous(),
            torch.from_numpy(masks), is_deep_update=True)
    v, hs = model.apply(variables, jnp.asarray(img), jnp.asarray(f16),
                        jnp.asarray(sensory), jnp.asarray(masks),
                        method=DEVANetwork.encode_mask)
    np.testing.assert_allclose(np.asarray(v), to_np_nhwc(rv), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(hs), to_np_nhwc(rh), rtol=1e-3,
                               atol=1e-4)


def test_read_memory_parity(nets, rng):
    ref, model, variables = nets
    n = 3 * h * w
    qk = rng.standard_normal((B, h, w, 64)).astype(np.float32)
    qe = rng.uniform(0, 1, (B, h, w, 64)).astype(np.float32)
    mk = rng.standard_normal((B, n, 64)).astype(np.float32)
    ms = rng.uniform(1, 4, (B, n)).astype(np.float32)
    mv = rng.standard_normal((B, O, n, 512)).astype(np.float32)

    with torch.no_grad():
        # reference shapes: qk B*Ck*H*W; mk B*Ck*T*H*W; mv B*O*Cv*T*H*W
        t_qk = to_torch_nchw(qk)
        t_qe = to_torch_nchw(qe)
        t_mk = torch.from_numpy(
            mk.reshape(B, 3, h, w, 64).transpose(0, 4, 1, 2, 3)).contiguous()
        t_ms = torch.from_numpy(
            ms.reshape(B, 3, h, w)[:, None]).contiguous()
        t_mv = torch.from_numpy(
            mv.reshape(B, O, 3, h, w, 512).transpose(0, 1, 5, 2, 3,
                                                     4)).contiguous()
        r = ref.read_memory(t_qk, t_qe, t_mk, t_ms, t_mv)
    out = model.apply(variables, jnp.asarray(qk), jnp.asarray(qe),
                      jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(mv),
                      method=DEVANetwork.read_memory)
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(r.numpy(), 2, -1),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("independent_objects", [False, True])
def test_segment_parity(nets, rng, independent_objects):
    ref, model, variables = nets
    f16 = rng.standard_normal((B, h, w, 512)).astype(np.float32)
    f8 = rng.standard_normal((B, H // 8, W // 8, 512)).astype(np.float32)
    f4 = rng.standard_normal((B, H // 4, W // 4, 256)).astype(np.float32)
    readout = rng.standard_normal((B, O, h, w, 512)).astype(np.float32)
    sensory = rng.standard_normal((B, O, h, w, 512)).astype(np.float32)
    last_mask = rng.uniform(0, 1, (B, O, H, W)).astype(np.float32)

    with torch.no_grad():
        tms = [to_torch_nchw(f16), to_torch_nchw(f8), to_torch_nchw(f4)]
        r_sens, r_logits, r_prob = ref.segment(
            tms,
            torch.from_numpy(np.moveaxis(readout, -1, -3)).contiguous(),
            torch.from_numpy(np.moveaxis(sensory, -1, -3)).contiguous(),
            torch.from_numpy(last_mask),
            independent_objects=independent_objects)
    sens, logits, prob = model.apply(
        variables, (jnp.asarray(f16), jnp.asarray(f8), jnp.asarray(f4)),
        jnp.asarray(readout), jnp.asarray(sensory), jnp.asarray(last_mask),
        independent_objects=independent_objects,
        method=DEVANetwork.segment)
    np.testing.assert_allclose(np.asarray(sens), to_np_nhwc(r_sens),
                               rtol=1e-3, atol=1e-4, err_msg="sensory")
    np.testing.assert_allclose(np.asarray(prob), r_prob.numpy(),
                               rtol=1e-3, atol=1e-4, err_msg="prob")
