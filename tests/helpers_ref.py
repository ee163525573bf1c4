"""Shared helpers: build a randomly-initialized reference DEVA (torch CPU,
no weight downloads) and its converted deva_tpu twin."""
import sys

import numpy as np

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def build_reference_deva(seed: int = 0):
    """Reference DEVA with deterministic random init; the torchvision
    pretrained-weight download (reference:deva/model/resnet.py:154-164) is
    disabled — weights stay at the module's own random init."""
    import torch
    from deva.model import resnet as ref_resnet
    orig_load = ref_resnet.load_weights_add_extra_dim
    orig_url = ref_resnet.model_zoo.load_url
    ref_resnet.load_weights_add_extra_dim = lambda *a, **k: None
    ref_resnet.model_zoo.load_url = lambda *a, **k: {}
    try:
        from deva.model.network import DEVA
        torch.manual_seed(seed)
        net = DEVA({"pix_feat_dim": 512, "key_dim": 64, "value_dim": 512})
        net.eval()
    finally:
        ref_resnet.load_weights_add_extra_dim = orig_load
        ref_resnet.model_zoo.load_url = orig_url
    return net


def converted_variables(net):
    from deva_tpu.models.convert import convert_torch_statedict
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return convert_torch_statedict(sd)


def tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(v.shape)
    return out


def rand_image(rng, b, h, w):
    return rng.standard_normal((b, h, w, 3)).astype(np.float32)


def to_torch_nchw(x):
    import torch
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, -3)))


def to_np_nhwc(t):
    return np.moveaxis(t.detach().numpy(), -3, -1)
