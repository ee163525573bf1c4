"""Train a tiny DEVA from scratch on synthetic moving squares and serve it —
the self-contained proof that the training stack produces a model that
tracks (see deva_tpu/training/toy.py).

  env PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/train_toy.py --steps 120

Measured (8-device virtual CPU mesh, fixed seeds): held-out propagation IoU
0.06 (random init) -> 0.93 after 120 steps.
"""
import sys
from os import path

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))


def main():
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 120
    from deva_tpu.training.toy import eval_iou, tiny_model, train_toy
    import jax

    model = tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 32, 32, 3)),
        jax.numpy.zeros((1, 1, 32, 32)), jax.numpy.zeros((1, 1, 2, 2, 32)))
    iou0 = eval_iou(model, variables)
    print(f"random-init held-out IoU: {iou0:.4f}")
    model, trained, losses = train_toy(steps=steps)
    iou1 = eval_iou(model, trained)
    print(f"trained held-out IoU after {steps} steps: {iou1:.4f}")


if __name__ == "__main__":
    main()
