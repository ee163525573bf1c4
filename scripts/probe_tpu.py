"""Probe the tunneled TPU's cost structure: RPC round-trip overhead vs
on-device compute, so bench/serving decisions (frames per launch, batch
size) are driven by measured numbers. Honest sync = host readback of one
element (block_until_ready returns early through the relay; identical
repeated calls may be dedup'd, so every call varies its input)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def sync(x):
    return float(jnp.ravel(x)[0])


def timed(name, fn, args_fn, n=8):
    ts = []
    for i in range(n):
        a = args_fn(i)
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    med = ts[len(ts) // 2]
    print(f"{name:40s} med={med*1e3:9.2f}ms  min={ts[0]*1e3:9.2f}ms "
          f"max={ts[-1]*1e3:9.2f}ms")
    return med


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    # 1. pure round trip: tiny scalar add
    f_add = jax.jit(lambda x: x + 1.0)
    xs = [jnp.float32(i) for i in range(16)]
    sync(f_add(xs[0]))
    timed("scalar add (RPC floor)", f_add, lambda i: (xs[i % 16],))

    # 2. chained tiny adds in one program (dispatch amortization probe)
    def chain(x):
        for _ in range(64):
            x = x + 1.0
        return x
    f_chain = jax.jit(chain)
    sync(f_chain(xs[0]))
    timed("64-chained adds, one launch", f_chain, lambda i: (xs[i % 16],))

    # 3. medium matmul (MXU): 2048^3 bf16 ~ 17 GFLOP
    k = 2048
    a = jnp.asarray(np.random.default_rng(0).standard_normal((k, k)),
                    jnp.bfloat16)
    f_mm = jax.jit(lambda a, s: (a * s) @ a)
    sync(f_mm(a, jnp.bfloat16(1.0)))
    t = timed("2048^3 bf16 matmul", f_mm,
              lambda i: (a, jnp.bfloat16(1.0 + i)))
    print(f"  -> {2 * k**3 / t / 1e12:.1f} TFLOP/s apparent")

    # 4. 64 matmuls in one launch
    def mm64(a, s):
        x = a * s
        for _ in range(64):
            x = x @ a * 1e-2
        return x
    f_mm64 = jax.jit(mm64)
    sync(f_mm64(a, jnp.bfloat16(1.0)))
    t = timed("64x 2048^3 matmuls, one launch", f_mm64,
              lambda i: (a, jnp.bfloat16(1.0 + i)))
    print(f"  -> {64 * 2 * k**3 / t / 1e12:.1f} TFLOP/s apparent")

    # 5. host->device transfer of a 480p batch-4 frame stack
    frames = [np.random.default_rng(i).standard_normal(
        (4, 480, 864, 3)).astype(np.float32) for i in range(8)]
    def put(i):
        t0 = time.perf_counter()
        x = jax.device_put(frames[i % 8])
        sync(x)
        return time.perf_counter() - t0
    ts = sorted(put(i) for i in range(8))
    mb = frames[0].nbytes / 1e6
    print(f"{'device_put 20MB frames':40s} med={ts[4]*1e3:9.2f}ms "
          f"({mb / ts[4]:.0f} MB/s)")

    # 6. donation probe: big buffer update with/without donation
    big = jnp.zeros((4, 16384, 4, 512), jnp.bfloat16)  # ~256MB
    upd = jnp.ones((4, 1620, 4, 512), jnp.bfloat16)
    def write(buf, u, i):
        return jax.lax.dynamic_update_slice(buf, u, (0, i, 0, 0))
    f_nodon = jax.jit(write)
    f_don = jax.jit(write, donate_argnums=(0,))
    sync(f_nodon(big, upd, 0))
    timed("256MB ring write, no donation", f_nodon,
          lambda i: (big, upd, i % 128))
    buf = jnp.zeros_like(big)
    def run_don(i):
        nonlocal buf
        t0 = time.perf_counter()
        buf = f_don(buf, upd, i % 128)
        sync(buf)
        return time.perf_counter() - t0
    sync(f_don(jnp.zeros_like(big), upd, 0))
    ts = sorted(run_don(i) for i in range(8))
    print(f"{'256MB ring write, donated':40s} med={ts[4]*1e3:9.2f}ms")


if __name__ == "__main__":
    main()
