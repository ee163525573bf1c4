"""Same-host measured baseline (VERDICT r4 #5): reference DEVA (torch, CPU)
vs deva_tpu (JAX, CPU) on the vendored `example/vos` clip.

This image has no GPU and zero egress (released weights undownloadable), so
the only *measurable* reference datum is its CPU throughput on this very
box. Throughput is weight-independent, so both sides run random-init at the
identical operating point (480p min-side, top_k=30, mem_every=5, LT
enabled; the clip is 4 frames, far below saturation). The measured region
mirrors the reference's own CUDA-event window
(reference:evaluation/eval_vos.py:150-185: step + resize + argmax +
tmp-id remap), with perf_counter in place of CUDA events (CPU).

Besides the raw 4-frame clip, a cycled 16-frame pass (the same 4 frames
repeated; first-frame mask only) is measured for a steadier denominator and
to include memory writes/top-k at a grown bank.

Run:
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/measure_baseline_cpu.py
Prints one JSON line; record the result in BASELINE.md.
"""
import json
import sys
import time
from os import path

import numpy as np

ROOT = path.dirname(path.dirname(path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub(name, **attrs):
    import types
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


# the reference imports these at module scope; neither is installed here
_stub("pulp", LpProblem=None, LpVariable=None, LpMaximize=None,
      lpSum=None, PULP_CBC_CMD=None)
_stub("pycocotools")
_stub("pycocotools.mask", encode=None, decode=None)


def build_reference_net(seed=0):
    """Random-init reference DEVA on CPU (torchvision download disabled),
    as tests/helpers_ref.py does."""
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


def ref_config():
    from argparse import ArgumentParser
    from deva.inference.eval_args import add_common_eval_args
    parser = ArgumentParser()
    add_common_eval_args(parser)
    cfg = vars(parser.parse_args([]))
    cfg["enable_long_term"] = True
    cfg["enable_long_term_count_usage"] = False  # 4/16-frame clip: short
    return cfg


def load_clip(n_frames):
    """The example/vos bmx-trees clip, cycled to n_frames. Loaded through
    the deva_tpu reader (the reference's own reader needs torchvision,
    absent in this image); both sides consume the IDENTICAL resized,
    ImageNet-normalized pixels — ours NHWC, the reference's as [3, H, W]."""
    from deva_tpu.data.vos_test_datasets import GeneralVOSTestDataset
    meta = GeneralVOSTestDataset(path.join(ROOT, "example/vos"), size=480)
    vid_reader = next(iter(meta.get_datasets()))
    datas = [vid_reader[i] for i in range(len(vid_reader))]
    frames = [np.ascontiguousarray(
        np.moveaxis(np.asarray(d["rgb"], np.float32), -1, 0))
        for d in datas]                                       # [3, H, W]
    mask0 = np.asarray(datas[0]["mask"])                      # [H, W]
    seq = [frames[i % len(frames)] for i in range(n_frames)]
    return seq, mask0


def run_reference(net, seq, mask0):
    import torch
    import torch.nn.functional as F
    from deva.inference.inference_core import DEVAInferenceCore

    del F  # need_resize is False for this clip (reference skips interpolate)
    cfg = ref_config()
    processor = DEVAInferenceCore(net, config=cfg)
    labels = [int(v) for v in np.unique(np.asarray(mask0)) if v != 0]
    total = 0.0
    with torch.no_grad():
        for ti, f in enumerate(seq):
            image = torch.from_numpy(f)
            mask = torch.from_numpy(np.asarray(mask0)) if ti == 0 else None
            start = time.perf_counter()
            prob = processor.step(image, mask, labels if ti == 0 else None,
                                  end=(ti == len(seq) - 1))
            out_mask = torch.argmax(prob, dim=0)
            out_mask = processor.object_manager.tmp_to_obj_cls(out_mask)
            _ = out_mask.numpy()
            total += time.perf_counter() - start
    return len(seq) / total


def run_ours(seq, mask0):
    import jax
    import jax.numpy as jnp
    from deva_tpu.config import InferenceConfig, ModelConfig
    from deva_tpu.inference.core import InferenceCore
    from deva_tpu.models.network import DEVANetwork

    model = DEVANetwork(ModelConfig())   # CPU: resolves to f32, like torch
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig()              # same knobs as ref_config defaults
    mask0 = np.asarray(mask0)
    labels = [int(v) for v in np.unique(mask0) if v != 0]

    # NHWC for us; identical pixel content
    frames = [np.moveaxis(f, 0, -1).copy() for f in seq]

    def one_pass(core):
        total = 0.0
        for ti, f in enumerate(frames):
            start = time.perf_counter()
            prob = core.step(f, mask0 if ti == 0 else None,
                             labels if ti == 0 else None,
                             end=(ti == len(frames) - 1))
            ids = np.argmax(np.asarray(prob), axis=0)
            _ = core.object_manager.tmp_cls_to_obj_cls(ids)
            total += time.perf_counter() - start
        return len(frames) / total

    warm = InferenceCore(model, variables, cfg)
    one_pass(warm)                       # compiles every shape in the pass
    core = InferenceCore(model, variables, cfg)
    core._fused = warm._fused            # share the compiled executables
    return one_pass(core)


def main():
    import jax
    assert jax.default_backend() == "cpu", \
        "run with JAX_PLATFORMS=cpu (this is a same-host CPU measurement)"
    out = {"host": "single-core CPU (nproc=1), torch CPU vs jax CPU",
           "clip": "example/vos bmx-trees, 480p min-side, random init"}
    for tag, n in (("4f", 4), ("16f", 16)):
        seq, mask0 = load_clip(n)
        net = build_reference_net()
        # ours runs a full warm pass first (jit compiles excluded, like the
        # reference's already-warm torch kernels)
        ref_fps = run_reference(net, seq, mask0)
        our_fps = run_ours(seq, mask0)
        out[f"reference_cpu_fps_{tag}"] = round(ref_fps, 4)
        out[f"deva_tpu_cpu_fps_{tag}"] = round(our_fps, 4)
        out[f"ratio_{tag}"] = round(our_fps / ref_fps, 3)
        print(f"{tag}: reference {ref_fps:.4f} fps, ours {our_fps:.4f} fps,"
              f" ratio {our_fps / ref_fps:.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
