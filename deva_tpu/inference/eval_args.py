"""Shared evaluation CLI flags + model factory.

Behavioral anchor: reference:deva/inference/eval_args.py:7-72 (same flag names
and defaults so reference users can switch drivers without relearning).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.models.network import DEVANetwork


def add_common_eval_args(parser: ArgumentParser) -> None:
    parser.add_argument("--model", default="./saves/DEVA-propagation.pth")
    parser.add_argument("--output", default=None)
    parser.add_argument("--save_all", action="store_true",
                        help="Save all frames")
    parser.add_argument("--amp", action="store_true",
                        help="force bfloat16 compute on any backend (on TPU "
                        "bf16 is already the default; use --ring_dtype "
                        "float32 to opt out)")

    # model dims
    parser.add_argument("--key_dim", type=int, default=64)
    parser.add_argument("--value_dim", type=int, default=512)
    parser.add_argument("--pix_feat_dim", type=int, default=512)

    # long-term memory
    parser.add_argument("--disable_long_term", action="store_true")
    parser.add_argument("--max_mid_term_frames", type=int, default=10,
                        help="T_max in XMem, decrease to save memory")
    parser.add_argument("--min_mid_term_frames", type=int, default=5,
                        help="T_min in XMem, decrease to save memory")
    parser.add_argument("--max_long_term_elements", type=int, default=10000,
                        help="LT_max in XMem")
    parser.add_argument("--num_prototypes", type=int, default=128,
                        help="P in XMem")

    parser.add_argument("--top_k", type=int, default=30)
    parser.add_argument("--mem_every", type=int, default=5,
                        help="r in XMem; increase to improve speed")
    parser.add_argument("--chunk_size", type=int, default=-1,
                        help="accepted for reference CLI compatibility; the "
                        "TPU build batches all objects (no chunking needed)")
    parser.add_argument("--size", type=int, default=480,
                        help="Resize shorter side to this; -1 keeps original")
    parser.add_argument("--use_pallas_attention", action="store_true",
                        help="fused Pallas top-k readout on the hot path")
    parser.add_argument("--topk_method", default="auto",
                        choices=["auto", "exact", "approx"],
                        help="top-k selection: exact (sort, reference "
                        "parity) or approx (TPU-native, much faster); "
                        "auto = approx on TPU")
    parser.add_argument("--ring_dtype", default=None,
                        help="memory ring dtype (float32/bfloat16; default "
                        "bfloat16 on TPU, float32 elsewhere)")
    parser.add_argument("--obj_shards", type=int, default=1,
                        help="shard the object axis over this many devices "
                        "('model' mesh axis; XLA partitions the grouped "
                        "decoder/mask-encoder). Worthwhile only for large "
                        "object counts (automatic/text mode)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace of the whole run to "
                        "DIR (view with tensorboard / xprof)")
    parser.add_argument("--raise_on_error", action="store_true",
                        help="re-raise per-video errors instead of logging "
                        "and continuing with the next video (the reference "
                        "re-raises: reference:evaluation/eval_vos.py:213-216)")


class video_fault_barrier:
    """Per-video fault isolation: log the failure and keep the run alive.

    The reference wraps each video in try/except that prints and re-raises
    (reference:evaluation/eval_vos.py:213-216, eval_with_detections.py:316-319
    — with a "comment this out if you want" note on the raise); here one
    poisoned video must not kill a whole benchmark run, so the default is
    log-and-continue; --raise_on_error restores the reference behavior.
    """

    def __init__(self, vid_name: str, reraise: bool = False):
        self.vid_name = vid_name
        self.reraise = reraise
        self.failed = False

    def __enter__(self):
        return self

    def __exit__(self, etype, e, tb):
        if e is None or etype in (KeyboardInterrupt, SystemExit):
            return False
        print(f"Runtime error at {self.vid_name}")
        print(e)
        if self.reraise:
            return False
        if etype in (NameError, AttributeError, ImportError, SyntaxError,
                     TypeError):
            # programming errors hit every video identically — swallowing
            # them yields an exit-0 run with no output (a NameError hidden
            # this way cost a debugging round; see git d38abf5)
            return False
        import traceback
        traceback.print_exc()
        self.failed = True
        print(f"Skipping {self.vid_name} and continuing.")
        return True


def start_profile(profile_dir):
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        print(f"jax.profiler trace -> {profile_dir}")


def stop_profile(profile_dir):
    if profile_dir:
        jax.profiler.stop_trace()


def report_max_memory():
    """Print peak device memory, the TPU analog of the reference's
    torch.cuda.max_memory_allocated() report
    (reference:evaluation/eval_vos.py:221)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            print(f"Max allocated memory (MB): {peak / (2 ** 20):.1f}")
    except Exception:
        pass  # memory_stats is not available on every backend


def make_inference_config(args, **overrides) -> InferenceConfig:
    # default 'auto': bf16 rings on TPU (the benched serving config),
    # f32 elsewhere; --amp forces bf16 on any backend
    ring_dtype = args.ring_dtype or ("bfloat16" if args.amp else "auto")
    kw = dict(
        mem_every=args.mem_every,
        top_k=args.top_k,
        enable_long_term=not args.disable_long_term,
        max_mid_term_frames=args.max_mid_term_frames,
        min_mid_term_frames=args.min_mid_term_frames,
        num_prototypes=args.num_prototypes,
        max_long_term_elements=args.max_long_term_elements,
        size=args.size,
        use_pallas_attention=args.use_pallas_attention,
        topk_method=args.topk_method,
        ring_dtype=ring_dtype,
    )
    kw.update(overrides)
    return InferenceConfig(**kw)


def obj_mesh_from_args(args):
    """-> a 1 x obj_shards ('data', 'model') Mesh for object-axis sharding
    (deva_tpu/parallel/object_sharding.py), or None when --obj_shards 1."""
    n = getattr(args, "obj_shards", 1)
    if n <= 1:
        return None
    assert len(jax.devices()) >= n, \
        f"--obj_shards {n} needs {n} devices, have {len(jax.devices())}"
    from deva_tpu.parallel.mesh import make_mesh
    return make_mesh(1, n)


def apply_obj_sharding(args, variables):
    """-> (obj_mesh or None, variables). Builds the object-sharding mesh and
    replicates the weights over it ONCE, so each per-video
    InferenceCore(obj_mesh=...) device_put is a metadata no-op instead of a
    full weight-tree transfer."""
    mesh = obj_mesh_from_args(args)
    if mesh is not None:
        from deva_tpu.parallel.mesh import replicate
        variables = replicate(mesh, variables)
    return mesh, variables


def reject_obj_sharding(args, driver: str) -> None:
    """Drivers whose hot path is the batched propagator (video-axis mesh)
    don't support --obj_shards; fail loudly instead of silently ignoring."""
    if getattr(args, "obj_shards", 1) > 1:
        raise SystemExit(f"{driver} does not support --obj_shards (its "
                         "batched propagator shards the video axis); use "
                         "the sequential driver for object-axis sharding")


def load_variables(model: DEVANetwork, model_path: str):
    """Load weights: a reference torch .pth (converted on the fly) or a
    deva_tpu .npz export. Falls back to random init with a warning."""
    if model_path and os.path.exists(model_path):
        if model_path.endswith(".npz"):
            from flax.traverse_util import unflatten_dict
            flat = dict(np.load(model_path))
            tree = unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
            return {"params": tree["params"],
                    "batch_stats": tree["batch_stats"]}
        from deva_tpu.models.convert import load_torch_checkpoint
        return load_torch_checkpoint(model_path, model_config=model.config)
    print(f"No model loaded ({model_path!r} not found); using random init.")
    return model.init(jax.random.PRNGKey(42),
                      jnp.zeros((1, 32, 32, 3)),
                      jnp.zeros((1, 1, 32, 32)),
                      jnp.zeros((1, 1, 2, 2, model.config.value_dim)))


def save_variables_npz(variables, out_path: str) -> None:
    from flax.traverse_util import flatten_dict
    flat = flatten_dict({"params": variables["params"],
                         "batch_stats": variables["batch_stats"]})
    np.savez(out_path, **{"/".join(k): np.asarray(v)
                          for k, v in flat.items()})


def get_model_and_config(parser: ArgumentParser):
    args = parser.parse_args()
    mc = ModelConfig(pix_feat_dim=args.pix_feat_dim, key_dim=args.key_dim,
                     value_dim=args.value_dim,
                     dtype="bfloat16" if args.amp else "auto")
    model = DEVANetwork(mc)
    variables = load_variables(model, args.model)
    cfg = make_inference_config(args)
    return model, variables, cfg, args
