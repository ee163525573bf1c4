"""Convert a reference DEVA torch state_dict into deva_tpu flax variables.

Used for (a) loading the released `DEVA-propagation.pth` checkpoint to achieve
output parity with the reference, and (b) differential testing against a
randomly-initialized reference model.

Key-space anchor: the reference's module tree (reference:deva/model/network.py:
25-31 and big_modules.py/modules.py). Layout changes:
  torch conv weight [O,I,kh,kw]  -> flax kernel [kh,kw,I,O]
  torch linear weight [O,I]      -> flax kernel [I,O]
  BatchNorm weight/bias          -> params .../scale,bias
  BatchNorm running_mean/var     -> batch_stats .../mean,var
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# reference submodule names that are GConv2D (wrap an inner conv level "conv"
# in deva_tpu): see deva_tpu/models/blocks.py GConv2D.
_GCONV_PATHS = (
    ("mask_encoder", "sensory_update", "transform"),
    ("mask_decoder", "sensory_compress"),
    ("mask_decoder", "sensory_update", "g16_conv"),
    ("mask_decoder", "sensory_update", "g8_conv"),
    ("mask_decoder", "sensory_update", "g4_conv"),
    ("mask_decoder", "sensory_update", "transform"),
    ("mask_decoder", "sensory_linear_pred", "projection"),
)


def _map_key(parts: Tuple[str, ...]) -> Tuple[Tuple[str, ...], str]:
    """Map a torch key path (without the trailing param name) to the deva_tpu
    module path. Returns (path, kind) with kind in {conv, linear, bn}."""
    parts = list(parts)
    out = []
    kind = "conv"
    i = 0
    while i < len(parts):
        p = parts[i]
        if i == 0:
            out.append(p)  # pixel_encoder / mask_encoder / key_proj / mask_decoder
            i += 1
            continue
        top = parts[0]
        if top in ("pixel_encoder", "mask_encoder") and p in (
                "conv1", "bn1", "res2", "layer1", "layer2", "layer3"):
            if len(out) == 1:
                out.append("trunk")
            if p in ("conv1", "bn1"):
                out.append(p)
                if p == "bn1":
                    kind = "bn"
                i += 1
                continue
            # res2 == layer1 of the resnet50 (reference:big_modules.py:34)
            stage = "layer1" if p == "res2" else p
            block_idx = parts[i + 1]
            out.append(f"{stage}_{block_idx}")
            i += 2
            continue
        if p == "downsample" and parts[0] in ("pixel_encoder", "mask_encoder") \
                and "trunk" in out:
            # torch Sequential(downsample): 0=conv, 1=bn
            sub = parts[i + 1]
            out.append("downsample_conv" if sub == "0" else "downsample_bn")
            if sub == "1":
                kind = "bn"
            i += 2
            continue
        if p.startswith("bn") or p == "downsample_bn":
            kind = "bn"
            out.append(p)
            i += 1
            continue
        if p == "ChannelGate":
            # mlp.1 -> mlp_fc1, mlp.3 -> mlp_fc2 (Linear layers)
            assert parts[i + 1] == "mlp"
            idx = parts[i + 2]
            out.append("mlp_fc1" if idx == "1" else "mlp_fc2")
            kind = "linear"
            i += 3
            continue
        if p == "SpatialGate":
            # SpatialGate.spatial.conv -> spatial
            out.append("spatial")
            i += 3
            continue
        if p == "transforms":
            # decoder_feat_proc.transforms.{i} -> transform_{i}
            out.append(f"transform_{parts[i + 1]}")
            i += 2
            continue
        out.append(p)
        i += 1

    if tuple(out[:1]) == ("mask_decoder",) or tuple(out[:1]) == ("mask_encoder",):
        for g in _GCONV_PATHS:
            if tuple(out) == g:
                out.append("conv")
                break
    return tuple(out), kind


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_statedict(sd: Dict[str, "np.ndarray"]) -> Dict:
    """sd: torch state_dict (tensors or numpy arrays), keys like
    'pixel_encoder.res2.0.conv1.weight'. Returns flax variables
    {'params': ..., 'batch_stats': ...}."""
    params: Dict = {}
    batch_stats: Dict = {}
    for key, val in sd.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = key.split(".")
        pname = parts[-1]
        if pname == "num_batches_tracked":
            continue
        path, kind = _map_key(tuple(parts[:-1]))

        if kind == "bn" or pname in ("running_mean", "running_var"):
            if pname == "weight":
                _set(params, path + ("scale",), arr)
            elif pname == "bias":
                _set(params, path + ("bias",), arr)
            elif pname == "running_mean":
                _set(batch_stats, path + ("mean",), arr)
            elif pname == "running_var":
                _set(batch_stats, path + ("var",), arr)
            else:
                raise KeyError(f"unexpected BN param {key}")
            continue

        if pname == "weight":
            if kind == "linear":
                _set(params, path + ("kernel",), arr.T)
            elif arr.ndim == 4:
                _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            else:
                raise KeyError(f"unexpected weight shape {arr.shape} at {key}")
        elif pname == "bias":
            _set(params, path + ("bias",), arr)
        else:
            raise KeyError(f"unexpected param {key}")

    return {"params": params, "batch_stats": batch_stats}


def schema_diff(variables, model_config=None):
    """Diff a converted variable tree against the deva_tpu model's expected
    schema (shapes via jax.eval_shape — no compute). Returns
    (missing, extra, mismatched) flat key lists; all empty iff the
    conversion covered 100% of the model's parameters with correct shapes.
    The reference's state_dict() keyset is the schema of the released
    `DEVA-propagation.pth` (reference:deva/model/network.py:165-174), so an
    empty diff on a random-init reference proves the released file converts
    first-try."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from deva_tpu.config import ModelConfig
    from deva_tpu.models.network import DEVANetwork

    mc = model_config or ModelConfig()
    model = DEVANetwork(mc)
    expect = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, mc.value_dim))))
    exp = {"/".join(k): tuple(v.shape)
           for k, v in flatten_dict(expect).items()}
    got = {"/".join(k): tuple(np.shape(v))
           for k, v in flatten_dict(variables).items()}
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    mismatched = sorted(f"{k}: expected {exp[k]}, got {got[k]}"
                        for k in set(exp) & set(got) if exp[k] != got[k])
    return missing, extra, mismatched


def verify_converted(variables, model_config=None) -> None:
    """Raise if the converted tree does not exactly match the model schema."""
    missing, extra, mismatched = schema_diff(variables, model_config)
    if missing or extra or mismatched:
        raise ValueError(
            "converted checkpoint does not match the deva_tpu schema:\n"
            f"  missing ({len(missing)}): {missing[:10]}\n"
            f"  extra ({len(extra)}): {extra[:10]}\n"
            f"  shape mismatches ({len(mismatched)}): {mismatched[:10]}")


def load_torch_checkpoint(path: str, verify: bool = True,
                          model_config=None) -> Dict:
    """Load a torch .pth file (weights-only) and convert. Requires torch."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    variables = convert_torch_statedict(sd)
    if verify:
        verify_converted(variables, model_config)
    return variables
