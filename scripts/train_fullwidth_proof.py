"""Full-width learn-to-track proof on real hardware (VERDICT r4 #2).

tests/test_learning.py proves the training stack produces a tracker at
tiny dims; this script runs the SAME proof at the production model width
(ModelConfig(): pix 512 / key 64 / value 512) on whatever devices are
available — on the TPU chip this answers "does the flagship config train
in HBM, with what step time, and does it learn?" without any dataset
download. Synthetic moving-square clips (deva_tpu/training/toy.py), the
production DP train step (fwd+bwd+AdamW, optional remat), then the real
serving stack (InferenceCore) on held-out clips.

  python scripts/train_fullwidth_proof.py [--steps 80] [--b 4] [--t 4]
                                          [--hw 128] [--remat] [--f32]

Recorded runs live in STATUS.md (round 5). Reference training-shape
anchor: reference:deva/model/trainer.py:71-202, docs/TRAINING.md:39-42.
"""
import sys
import time
from os import path

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))


def main():
    def arg(flag, default, cast=int):
        return cast(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    steps = arg("--steps", 80)
    b = arg("--b", 4)
    t = arg("--t", 4)
    hw = arg("--hw", 128)
    remat = "--remat" in sys.argv

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from deva_tpu.config import ModelConfig
    from deva_tpu.models.network import DEVANetwork
    from deva_tpu.training.toy import eval_iou, train_toy

    dtype = "float32" if "--f32" in sys.argv else "bfloat16"
    model = DEVANetwork(ModelConfig(dtype=dtype))
    print(f"devices: {jax.devices()}  model: full-width {dtype}  "
          f"batch {b} x {t} frames @ {hw}^2  remat={remat}", flush=True)

    # square scaled with the crop so stride-16 features see it well
    size = max(12, hw // 4)

    t0 = time.perf_counter()
    iou0 = eval_iou(model, model.init(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((1, 32, 32, 3)),
        jax.numpy.zeros((1, 1, 32, 32)),
        jax.numpy.zeros((1, 1, 2, 2, model.config.value_dim))),
        h=hw, w=hw, size=size)
    print(f"random-init held-out IoU: {iou0:.3f} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    t0 = time.perf_counter()

    def log(msg):
        print(f"{msg}  (+{time.perf_counter() - t0:.0f}s)", flush=True)

    model, trained, losses = train_toy(
        steps=steps, b=b, t=t, lr=1e-4, n_data=1, seed=0,
        log_every=max(1, steps // 8), log=log, model=model,
        h=hw, w=hw, size=size, remat=remat)
    total = time.perf_counter() - t0
    print(f"trained {steps} steps in {total:.0f}s "
          f"({steps * b / total:.2f} samples/s incl. compile)", flush=True)

    iou1 = eval_iou(model, trained, h=hw, w=hw, size=size)
    print(f"held-out IoU: {iou0:.3f} -> {iou1:.3f}  "
          f"loss {losses[0]:.2f} -> {losses[-1]:.2f}", flush=True)
    if "--smoke" in sys.argv:  # plumbing check only (too few steps to learn)
        print("SMOKE-OK", flush=True)
        return
    assert iou1 > iou0 + 0.2, "full-width model failed to learn"
    print("PROOF-OK", flush=True)


if __name__ == "__main__":
    main()
