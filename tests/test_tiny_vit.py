"""Flax TinyViT (MobileSAM image encoder) vs the reference's vendored torch
implementation (reference:deva/ext/MobileSAM/tiny_vit_sam.py), with converted
random-init weights. timm (only needed for DropPath/init helpers) is not
installed; eval-mode stubs are injected."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from deva_tpu.ext.tiny_vit import TinyViT, convert_tiny_vit_statedict

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub_timm():
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval mode: identity
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    registry.register_model = lambda fn: fn
    sys.modules.update({"timm": timm, "timm.models": models,
                        "timm.models.layers": layers,
                        "timm.models.registry": registry})


def test_tiny_vit_matches_reference():
    _stub_timm()
    from deva.ext.MobileSAM.tiny_vit_sam import TinyViT as RefTinyViT

    # MobileSAM dims with reduced depths; img_size must be 1024 (the
    # reference hardcodes the final 64x64 grid,
    # reference:tiny_vit_sam.py:655-657)
    depths = [1, 1, 2, 1]
    torch.manual_seed(0)
    ref = RefTinyViT(img_size=1024, in_chans=3, num_classes=1000,
                     embed_dims=[64, 128, 160, 320], depths=depths,
                     num_heads=[2, 4, 5, 10], window_sizes=[7, 7, 14, 7],
                     mlp_ratio=4., drop_rate=0., drop_path_rate=0.0,
                     use_checkpoint=False, mbconv_expand_ratio=4.0,
                     local_conv_size=3, layer_lr_decay=1.0)
    ref.eval()
    # running BN stats at random-but-valid values
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    variables = convert_tiny_vit_statedict(ref.state_dict())
    model = TinyViT(depths=tuple(depths))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1024, 1024, 3)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = np.moveaxis(want.numpy(), 1, -1)  # NCHW -> NHWC

    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 64, 64, 256)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
