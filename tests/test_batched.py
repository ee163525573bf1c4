"""Batched multi-video propagation == sequential single-video propagation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.batched import BatchedPropagator
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork

H, W = 64, 96


def _video(rng, t, n_obj):
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    frames = [np.kron(base + 0.1 * rng.standard_normal((H // 8, W // 8, 3)),
                      np.ones((8, 8, 1))).astype(np.float32)
              for _ in range(t)]
    mask0 = np.zeros((H, W), np.int64)
    mask0[8:28, 10:40] = 1
    if n_obj > 1:
        mask0[36:60, 50:90] = 2
    return frames, mask0


def test_batched_equals_sequential():
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False)

    rng = np.random.default_rng(6)
    vids = [_video(rng, 5, 1), _video(rng, 5, 2)]
    objects = [[1], [1, 2]]

    # sequential single-video reference
    seq_probs = []
    for (frames, mask0), objs in zip(vids, objects):
        core = InferenceCore(model, variables, cfg)
        core.step(frames[0], mask0, objects=objs)
        seq_probs.append([np.asarray(core.step(f)) for f in frames[1:]])

    # batched lockstep
    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([v[0][0] for v in vids], [v[1] for v in vids], objects)
    # The vmapped body compiles to a different op schedule than the
    # single-video step; after a memory write the random-init recurrence
    # amplifies that float noise at boundary pixels (same effect as in
    # test_step_chunk), so frames after the first in-batch write get a
    # small pixel budget.
    for ti in range(1, 5):
        probs = bp.step_all([v[0][ti] for v in vids])
        for vi, objs in enumerate(objects):
            got = np.asarray(probs[vi][:len(objs) + 1])
            want = seq_probs[vi][ti - 1]
            if ti <= 2:
                np.testing.assert_allclose(got, want, atol=1e-3,
                                           err_msg=f"v{vi} f{ti}")
            else:
                bad = (np.abs(got - want) > 5e-3).any(axis=0)
                assert bad.mean() <= 0.02, \
                    f"video {vi} frame {ti}: {bad.mean():.2%} pixels differ"
                diff = got.argmax(0) != want.argmax(0)
                assert diff.mean() <= 0.02, \
                    f"video {vi} frame {ti}: argmax {diff.mean():.2%}"


def test_block_equals_per_frame_stepping():
    """step_block (K frames per launch, scan prefix + write tail) must
    produce the same probabilities and ring state as per-frame step_all."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=3, top_k=8, enable_long_term=False)

    rng = np.random.default_rng(7)
    t = 7  # frame 0 init; blocks of K=3 cover frames 1..6 (writes at 3, 6)
    vids = [_video(rng, t, 1), _video(rng, t, 2)]
    objects = [[1], [1, 2]]

    def fresh():
        bp = BatchedPropagator(model, variables, cfg)
        bp.initialize([v[0][0] for v in vids], [v[1] for v in vids], objects)
        return bp

    ref = fresh()
    ref_probs = [np.asarray(ref.step_all([v[0][ti] for v in vids]))
                 for ti in range(1, t)]

    blk = fresh()
    blk.reserve(2)
    out = []
    for t0 in (1, 4):
        probs = blk.step_block(
            np.stack([np.stack(v[0][t0:t0 + 3]) for v in vids]))
        out.extend(np.asarray(probs[:, i]) for i in range(3))

    assert int(blk.sizes[0]) == int(ref.sizes[0])
    assert blk._last_mem_ti() == ref._last_mem_ti()
    for ti, (got, want) in enumerate(zip(out, ref_probs), start=1):
        bad = (np.abs(got - want) > 5e-3).any(axis=1)
        assert bad.mean() <= 0.02, f"frame {ti}: {bad.mean():.2%} differ"
        diff = got.argmax(1) != want.argmax(1)
        assert diff.mean() <= 0.02, f"frame {ti}: argmax {diff.mean():.2%}"


def test_block_end_no_write():
    """end=True blocks must not write memory and must not update _mem_ti."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=3, top_k=8, enable_long_term=False)
    rng = np.random.default_rng(8)
    vids = [_video(rng, 4, 1)]
    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([vids[0][0][0]], [vids[0][1]], [[1]])
    size0 = int(bp.sizes[0])
    probs = bp.step_block(np.stack([np.stack(vids[0][0][1:4])]), end=True)
    assert probs.shape[1] == 3
    assert int(bp.sizes[0]) == size0
    assert bp._last_mem_ti() == 0


def test_batched_long_term_equals_sequential():
    """Lockstep batched propagation WITH long-term memory — consolidation,
    usage counting, and usage-based eviction (batched.py v2) — must match
    sequential single-video propagation."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    # hw = 4*6 = 24 tokens/frame; max_work 96 -> consolidation every 2
    # writes after warmup; max_lt 24 with P=8 -> eviction engages too
    cfg = InferenceConfig(mem_every=1, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=8, max_long_term_elements=24,
                          topk_method="exact")

    t = 12
    rng = np.random.default_rng(9)
    vids = [_video(rng, t, 1), _video(rng, t, 2)]
    objects = [[1], [1, 2]]

    seq_probs, seq_cores = [], []
    for (frames, mask0), objs in zip(vids, objects):
        core = InferenceCore(model, variables, cfg)
        core.step(frames[0], mask0, objects=objs)
        seq_probs.append([np.asarray(core.step(f)) for f in frames[1:]])
        seq_cores.append(core)

    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([v[0][0] for v in vids], [v[1] for v in vids], objects)
    for ti in range(1, t):
        probs = bp.step_all([v[0][ti] for v in vids])
        for vi, objs in enumerate(objects):
            got = np.asarray(probs[vi][:len(objs) + 1])
            want = seq_probs[vi][ti - 1]
            bad = (np.abs(got - want) > 5e-3).any(axis=0)
            assert bad.mean() <= 0.02, \
                f"video {vi} frame {ti}: {bad.mean():.2%} pixels differ"
            diff = got.argmax(0) != want.argmax(0)
            assert diff.mean() <= 0.02, \
                f"video {vi} frame {ti}: argmax {diff.mean():.2%}"

    # ring bookkeeping must agree exactly with the sequential engine
    for vi, core in enumerate(seq_cores):
        (_, b), = core.memory.buckets.items()
        assert int(bp.sizes[vi]) == b.size, (vi, bp.sizes[vi], b.size)
        lt = core.memory.long_buckets.get(0)
        assert lt is not None and lt.size > 0, "test must engage long-term"
        assert int(bp.lt_sizes[vi]) == lt.size, \
            (vi, bp.lt_sizes[vi], lt.size)


def test_batched_mesh_equals_unsharded():
    """Multi-chip serving (SURVEY §2.8: per-device video sharding): the
    BatchedPropagator with a 'data'-axis mesh must produce the same outputs
    and ring/LT state as the unsharded batched path. Long-term memory is on
    so lockstep consolidation runs over sharded stacked rings too."""
    from deva_tpu.parallel.mesh import make_mesh

    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=1, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=3, min_mid_term_frames=1,
                          num_prototypes=8, topk_method="exact")

    t = 6
    rng = np.random.default_rng(11)
    vids = [_video(rng, t, 1), _video(rng, t, 2),
            _video(rng, t, 2), _video(rng, t, 1)]
    objects = [[1], [1, 2], [1, 2], [1]]
    first = [v[0][0] for v in vids]
    masks = [v[1] for v in vids]

    bp_ref = BatchedPropagator(model, variables, cfg)
    bp_ref.initialize(first, masks, objects)

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    bp_mesh = BatchedPropagator(model, variables, cfg, mesh=mesh)
    bp_mesh.initialize(first, masks, objects)

    for ti in range(1, t):
        p_ref = np.asarray(bp_ref.step_all([v[0][ti] for v in vids]))
        p_mesh = np.asarray(bp_mesh.step_all([v[0][ti] for v in vids]))
        # partitioned convs (per-device batch 1) schedule differently from
        # the batch-4 vmapped ones; with mem_every=1 the random-init
        # recurrence amplifies that float noise after the first write —
        # same pixel-budget comparison as test_batched_equals_sequential
        if ti == 1:
            np.testing.assert_allclose(p_mesh, p_ref, atol=1e-3,
                                       err_msg=f"frame {ti}")
        else:
            bad = (np.abs(p_mesh - p_ref) > 5e-3).any(axis=1)
            assert bad.mean() <= 0.02, \
                f"frame {ti}: {bad.mean():.2%} pixels differ"
            flips = p_mesh.argmax(1) != p_ref.argmax(1)
            assert flips.mean() <= 0.02, \
                f"frame {ti}: argmax {flips.mean():.2%}"

    # consolidation must have fired (max_work = 3 frames of tokens); the
    # sharded LT bookkeeping must agree exactly, ring contents to the same
    # noise budget
    assert (bp_ref.lt_sizes > 0).all()
    np.testing.assert_array_equal(bp_mesh.lt_sizes, bp_ref.lt_sizes)
    np.testing.assert_array_equal(bp_mesh.sizes, bp_ref.sizes)
    key_diff = np.abs(np.asarray(bp_mesh.key) - np.asarray(bp_ref.key))
    assert (key_diff > 5e-2).mean() <= 0.02, key_diff.max()
    lt_diff = np.abs(np.asarray(bp_mesh.lt_key) - np.asarray(bp_ref.lt_key))
    assert (lt_diff > 5e-2).mean() <= 0.02, lt_diff.max()


def test_batched_lt_eviction_requires_usage_counting():
    """Saturating long-term memory with enable_long_term_count_usage=False
    must raise (every usage is 0, so the strictly-greater eviction threshold
    would silently wipe the whole LT store) rather than corrupt state."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=1, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=False,
                          max_mid_term_frames=3, min_mid_term_frames=1,
                          num_prototypes=8, max_long_term_elements=10,
                          topk_method="exact")
    t = 8
    rng = np.random.default_rng(12)
    frames, mask0 = _video(rng, t, 1)
    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([frames[0]], [mask0], [[1]])
    with pytest.raises(AssertionError, match="count_usage"):
        for ti in range(1, t):
            bp.step_all([frames[ti]])


def test_delayed_consolidation_trigger():
    """max_mid_term_frames <= min_mid_term_frames + 1: the reference's
    min-size guard (kv_memory_store.py:134-135) delays compress one write
    PAST max_work_tokens, so the stacked rings must hold the delayed
    trigger size (min_work + 2*hw) instead of clamping writes at max_work
    (a clamped dynamic_update_slice silently overwrites the last frame's
    tokens). Regression: batched == sequential under that config."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=1, top_k=8, enable_long_term=True,
                          max_mid_term_frames=3, min_mid_term_frames=2,
                          num_prototypes=8, topk_method="exact")
    rng = np.random.default_rng(51)
    t = 8
    vids = [_video(rng, t, 1), _video(rng, t, 2)]
    objects = [[1], [1, 2]]

    seq_cores = []
    seq_last = []
    for (frames, mask0), objs in zip(vids, objects):
        core = InferenceCore(model, variables, cfg)
        core.step(frames[0], mask0, objects=objs)
        for f in frames[1:]:
            p = core.step(f)
        seq_cores.append(core)
        seq_last.append(np.asarray(p))

    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize([v[0][0] for v in vids], [v[1] for v in vids], objects)
    for ti in range(1, t):
        probs = bp.step_all([v[0][ti] for v in vids])

    # compress fired at 96 tokens (max_work=72 delayed by the guard) and
    # sieved back to 48 — identically in both flows, with LT engaged
    want = seq_cores[0].memory.num_work_tokens
    assert want == 48, want
    assert int(bp.sizes[0]) == want, (int(bp.sizes[0]), want)
    assert bp._lt_engaged
    want_lt = list(seq_cores[0].memory.long_buckets.values())[0].size
    assert int(bp.lt_sizes[0]) == want_lt, (int(bp.lt_sizes[0]), want_lt)
    for vi, objs in enumerate(objects):
        got = np.asarray(probs[vi][:len(objs) + 1])
        bad = (np.abs(got - seq_last[vi]) > 5e-3).any(axis=0)
        assert bad.mean() <= 0.05, f"video {vi}: {bad.mean():.2%} differ"
