"""Benchmark: steady-state 480p propagation throughput (frames/sec/chip).

Measures the production serving configuration: batched multi-video
propagation (B=4 videos per compiled launch, SURVEY.md §7 phase 9 —
"speed-of-light on v5e requires batching across videos"), 2-3 objects per
video, default memory config at 480x864. Falls back to single-stream
stepping (the reference's own measurement shape,
reference:evaluation/eval_vos.py:150-185) if the batched path fails, and
reports that with `--single`.

Honest timing on the tunneled chip: host readbacks force the dependency
chain (block_until_ready returns early through the relay) and the median of
three measurement windows reduces time-sharing noise.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is fps / 30.0 — 30 fps is the assumed reference A100 480p
single-stream throughput (the repo publishes no numbers; the driver target
is >= 3x A100, i.e. vs_baseline >= 3).
"""
import json
import sys
import time

import numpy as np


def _median_windows(run_window, n=3):
    times = []
    for _ in range(n):
        times.append(run_window())
    return sorted(times)[len(times) // 2]


def bench_single(model, variables, cfg, frames, mask0, warmup, measure):
    import jax
    from deva_tpu.inference.core import InferenceCore
    core = InferenceCore(model, variables, cfg)
    prob = core.step(frames[0], mask0, objects=[1, 2, 3])
    for i in range(1, warmup):
        prob = core.step(frames[i % len(frames)])
    _ = float(prob[0, 0, 0])

    def window():
        t0 = time.perf_counter()
        p = None
        for i in range(measure):
            p = core.step(frames[i % len(frames)])
        _ = float(p[0, 0, 0])
        return time.perf_counter() - t0

    return measure / _median_windows(window)


def bench_batched(model, variables, cfg, frames, mask0, warmup, measure,
                  batch):
    import dataclasses
    from deva_tpu.inference.batched import BatchedPropagator
    cfg = dataclasses.replace(cfg, enable_long_term=False)
    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([frames[0]] * batch, [mask0] * batch,
                  [[1, 2, 3]] * batch)
    probs = None
    for i in range(1, warmup):
        probs = bp.step_all([frames[(i + j) % len(frames)]
                             for j in range(batch)])
    _ = float(probs[0, 0, 0, 0])

    def window():
        t0 = time.perf_counter()
        p = None
        for i in range(measure):
            p = bp.step_all([frames[(i + j) % len(frames)]
                             for j in range(batch)])
        _ = float(p[0, 0, 0, 0])
        return time.perf_counter() - t0

    return measure * batch / _median_windows(window)


def main():
    import jax
    import jax.numpy as jnp

    from deva_tpu.config import InferenceConfig, ModelConfig
    from deva_tpu.models.network import DEVANetwork

    h, w = 480, 864
    batch = 4
    warmup, measure = 30, 40
    single = "--single" in sys.argv

    dtype = "bfloat16" if "--f32" not in sys.argv else "float32"
    model = DEVANetwork(ModelConfig(dtype=dtype))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 1, 32, 32)), jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(ring_dtype=dtype,
                          use_pallas_attention="--pallas" in sys.argv)

    rng = np.random.default_rng(0)
    base = rng.standard_normal((h, w, 3)).astype(np.float32)
    frames = [jax.device_put(jnp.asarray(
        base + 0.05 * rng.standard_normal((h, w, 3)), jnp.float32))
        for _ in range(8)]
    mask0 = np.zeros((h, w), np.int64)
    mask0[80:240, 100:400] = 1
    mask0[300:440, 500:800] = 2
    mask0[60:160, 600:840] = 3

    t0 = time.perf_counter()
    metric = "480p_propagation_fps_per_chip"
    if single:
        fps = bench_single(model, variables, cfg, frames, mask0, 60, 60)
        metric += "_single_stream"
    else:
        try:
            fps = bench_batched(model, variables, cfg, frames, mask0,
                                warmup, measure, batch)
            metric += f"_batch{batch}"
        except Exception as e:  # never leave the driver without a number
            print(f"batched bench failed ({e!r}); single-stream fallback",
                  file=sys.stderr)
            fps = bench_single(model, variables, cfg, frames, mask0, 60, 60)
            metric += "_single_stream"
    print(f"total bench time {time.perf_counter() - t0:.0f}s, "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
