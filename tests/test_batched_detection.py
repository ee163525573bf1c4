"""Batched detection-fusion stepping == sequential single-video stepping.

The batched propagator (deva_tpu/inference/batched_detection.py) advances
multi-bucket detection videos in lockstep and batches the incorporate
forward prediction; consensus/merge run on the same per-video cores either
way, so outputs must match the strictly-sequential reference flow
(reference:evaluation/eval_with_detections.py:205-265, online mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.batched_detection import BatchedDetectionPropagator
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.object_utils import convert_json_dict_to_objects_info
from deva_tpu.models.network import DEVANetwork

H, W = 64, 96


def _video(rng, t, third_at=None, dx_step=2):
    frames, det_masks, det_infos = [], [], []
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    for i in range(t):
        img = base + 0.1 * rng.standard_normal((H // 8, W // 8, 3))
        frames.append(np.kron(img, np.ones((8, 8, 1))).astype(np.float32))
        m = np.zeros((H, W), np.int64)
        dx = dx_step * i
        m[8:28, 10 + dx:40 + dx] = 1
        m[36:60, 50:90] = 2
        info = [{"id": 1, "isthing": 1, "category_id": 5},
                {"id": 2, "isthing": 1, "category_id": 7}]
        if third_at is not None and i >= third_at:
            m[2:18, 60:88] = 3
            info.append({"id": 3, "isthing": 0, "category_id": 20})
        det_masks.append(m)
        det_infos.append(info)
    return frames, det_masks, det_infos


def _segs(info_dicts):
    objs = convert_json_dict_to_objects_info(None, info_dicts)
    for d, o in zip(info_dicts, objs):
        o.isthing = bool(d["isthing"])
    return objs


def _run_sequential(model, variables, cfg, vids, det_every):
    """Reference-shaped online loop: incorporate every det_every frames,
    plain step otherwise. Returns per-video per-frame probs."""
    all_probs, cores = [], []
    for frames, det_masks, det_infos in vids:
        core = InferenceCore(model, variables, cfg)
        core.enabled_long_id()
        probs = []
        for ti in range(len(frames)):
            if ti % det_every == 0:
                p = core.incorporate_detection(frames[ti], det_masks[ti],
                                               _segs(det_infos[ti]))
            else:
                p = core.step(frames[ti], None, None)
            probs.append(np.asarray(p))
        all_probs.append(probs)
        cores.append(core)
    return all_probs, cores


def _run_batched(model, variables, cfg, vids, det_every):
    cores = []
    for frames, det_masks, det_infos in vids:
        core = InferenceCore(model, variables, cfg)
        core.enabled_long_id()
        cores.append(core)
    t = len(vids[0][0])
    bp = BatchedDetectionPropagator(model, variables, cfg)
    all_probs = [[] for _ in vids]

    for ti in range(t):
        if ti % det_every == 0:
            if ti > 0:
                # ONE batched launch for every core's forward prediction —
                # BEFORE detaching, so its sensory update (the reference's
                # internal _segment updates sensory too) reaches the cores
                fwd = bp.forward_probs([v[0][ti] for v in vids])
                bp.detach()
            for vi, (frames, det_masks, det_infos) in enumerate(vids):
                fm = None
                if ti > 0:
                    n = cores[vi].object_manager.num_obj
                    fm = np.argmax(fwd[vi][:n + 1], axis=0)
                p = cores[vi].incorporate_detection(
                    frames[ti], det_masks[ti], _segs(det_infos[ti]),
                    forward_mask=fm)
                all_probs[vi].append(np.asarray(p))
            bp.attach(cores)
        else:
            probs = bp.step_all([v[0][ti] for v in vids])
            for vi in range(len(vids)):
                n = cores[vi].object_manager.num_obj
                lw, uw, lh, uh = cores[vi].pad
                all_probs[vi].append(np.asarray(probs[vi][:n + 1]))
    bp.detach()
    return all_probs, cores


def test_batched_detection_equals_sequential():
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                          max_missed_detection_count=3,
                          topk_method="exact")
    det_every = 3
    t = 8
    rng = np.random.default_rng(21)
    # video 1 grows a third object at the second detection -> new bucket;
    # video 0 stays two-object single-bucket
    vids = [_video(rng, t), _video(rng, t, third_at=det_every)]

    seq, seq_cores = _run_sequential(model, variables, cfg, vids,
                                     det_every)
    got, cores = _run_batched(model, variables, cfg, vids, det_every)

    for vi in range(len(vids)):
        for ti in range(t):
            r, o = seq[vi][ti], got[vi][ti]
            assert r.shape == o.shape, (vi, ti, r.shape, o.shape)
            # sequential video-0 runs the fused single-bucket program while
            # the batched body is the slot-loop program; identical math,
            # different op schedules — the random-init recurrence amplifies
            # that float noise at boundary pixels over time (same effect and
            # budgets as test_batched/test_step_chunk, growing with ti)
            budget = 0.02 if ti < 6 else 0.05
            bad = (np.abs(o - r) > 5e-3).any(axis=0)
            assert bad.mean() <= budget, \
                f"video {vi} frame {ti}: {bad.mean():.2%} pixels differ"
            flips = o.argmax(0) != r.argmax(0)
            assert flips.mean() <= budget, \
                f"video {vi} frame {ti}: argmax {flips.mean():.2%}"

    # multi-bucket state really exercised, and the batched flow ends with
    # the SAME bucket structure as the sequential one (random-init forward
    # predictions mint extra objects at later votes — in both flows alike)
    assert any(len(c.memory.buckets) >= 2 for c in cores)
    # (object ids are RANDOM long ids — different draws per run
    # (reference:deva/inference/object_manager.py:38-53) — so compare
    # bucket sizes and object counts, not id values)
    for vi, (sc, bc) in enumerate(zip(seq_cores, cores)):
        s_b = {bid: (b.size, len(b.obj_ids))
               for bid, b in sc.memory.buckets.items()}
        b_b = {bid: (b.size, len(b.obj_ids))
               for bid, b in bc.memory.buckets.items()}
        assert s_b == b_b, (vi, s_b, b_b)


def test_empty_lane_rides_along():
    """A video whose detections have all come up empty (num_obj == 0 — the
    reference tolerates this per-video, reference:deva/inference/
    inference_core.py:57-59) must ride along in the batch as an EMPTY lane
    instead of tripping attach, and must re-enter once a detection engages
    it. Regression: a real VIPSeg-style run can purge every object of one
    video (empty consensus x max_missed_detection_count) while the rest of
    the group keeps propagating."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                          max_missed_detection_count=3, topk_method="exact")
    det_every, t = 3, 6
    rng = np.random.default_rng(33)
    vid0 = _video(rng, t)
    # vid1: NO detections until ti=3 (empty mask, empty segments)
    f1, m1, i1 = _video(rng, t)
    for ti in range(det_every):
        m1[ti] = np.zeros((H, W), np.int64)
        i1[ti] = []
    vid1 = (f1, m1, i1)
    vids = [vid0, vid1]

    seq, seq_cores = _run_sequential(model, variables, cfg, vids, det_every)
    got, cores = _run_batched(model, variables, cfg, vids, det_every)

    # the engaged lane is unaffected by its empty neighbor
    for ti in range(t):
        r, o = seq[0][ti], got[0][ti]
        assert r.shape == o.shape, (ti, r.shape, o.shape)
        bad = (np.abs(o - r) > 5e-3).any(axis=0)
        assert bad.mean() <= 0.02, f"frame {ti}: {bad.mean():.2%}"
    # the empty lane outputs pure background until its first detection...
    for ti in range(det_every):
        assert got[1][ti].shape[0] == 1
        assert (got[1][ti].argmax(0) == 0).all()
    # ...then engages and matches the sequential flow
    assert cores[1].memory is not None and cores[1].memory.engaged
    for ti in range(det_every, t):
        r, o = seq[1][ti], got[1][ti]
        assert r.shape == o.shape, (ti, r.shape, o.shape)
        bad = (np.abs(o - r) > 5e-3).any(axis=0)
        assert bad.mean() <= 0.02, f"frame {ti}: {bad.mean():.2%}"
    s_b = {bid: (b.size, len(b.obj_ids))
           for bid, b in seq_cores[1].memory.buckets.items()}
    b_b = {bid: (b.size, len(b.obj_ids))
           for bid, b in cores[1].memory.buckets.items()}
    assert s_b == b_b


def test_batched_consensus_alignment_matches_per_video():
    """align_consensus_batched (ONE vmapped launch + device argmax) must
    reproduce the per-video spatial_alignment + np.argmax consensus path:
    same consensus masks and merged segment votes (up to the usual
    padded-object-channel softmax drift at argmax boundaries). Also pins
    forward_ids == argmax(forward_probs[:n+1])."""
    from deva_tpu.inference.frame_utils import FrameInfo

    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                          num_voting_frames=3, topk_method="exact")
    rng = np.random.default_rng(7)
    # video 1 has 3 segments (different object count than video 0's 2):
    # exercises the shared batched object pad
    vids = [_video(rng, 3), _video(rng, 3, third_at=0)]
    cores = []
    for frames, det_masks, det_infos in vids:
        c = InferenceCore(model, variables, cfg)
        c.enabled_long_id()
        for ti in range(3):
            c.add_to_temporary_buffer(FrameInfo(
                frames[ti], det_masks[ti], _segs(det_infos[ti]), ti, {}))
        cores.append(c)

    bp = BatchedDetectionPropagator(model, variables, cfg)
    projs = bp.align_consensus_batched(cores, keyframe_selection="first")
    assert sorted(projs[0].keys()) == [1, 2]

    for vi, c in enumerate(cores):
        ti_b, mask_b, info_b = c.vote_in_temporary_buffer(
            keyframe_selection="first", precomputed_proj=projs[vi])
        ti_r, mask_r, info_r = c.vote_in_temporary_buffer(
            keyframe_selection="first")
        assert ti_b == ti_r
        assert (mask_b != mask_r).mean() < 0.01, \
            f"video {vi}: {(mask_b != mask_r).mean():.2%} ids differ"
        assert [o.category_ids for o in info_b] == \
            [o.category_ids for o in info_r]

    # forward_ids == argmax(forward_probs[:n+1]) after real state exists
    for c, (frames, det_masks, det_infos) in zip(cores, vids):
        c.incorporate_detection(frames[0], det_masks[0],
                                _segs(det_infos[0]))
        c.clear_buffer()
    bp.attach(cores)
    imgs = [v[0][1] for v in vids]
    sens0 = bp.sensory  # forward updates sensory; equal states for both
    fwd = bp.forward_probs(imgs)
    bp.sensory = sens0
    ids = bp.forward_ids(imgs)
    for vi, c in enumerate(cores):
        n = c.object_manager.num_obj
        ref_ids = np.argmax(fwd[vi][:n + 1], axis=0)
        assert (ids[vi] != ref_ids).mean() < 0.01
    bp.detach()


def test_batched_detection_state_roundtrip():
    """attach -> detach with no steps must leave core state untouched."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=False,
                          topk_method="exact")
    rng = np.random.default_rng(22)
    frames, det_masks, det_infos = _video(rng, 4, third_at=2)
    core = InferenceCore(model, variables, cfg)
    core.enabled_long_id()
    core.incorporate_detection(frames[0], det_masks[0], _segs(det_infos[0]))
    core.step(frames[1], None, None)
    core.incorporate_detection(frames[2], det_masks[2], _segs(det_infos[2]))

    before = {bid: (np.asarray(b.key).copy(), int(b.size), list(b.obj_ids))
              for bid, b in core.memory.buckets.items()}
    sensory0 = np.asarray(core.memory.sensory).copy()

    bp = BatchedDetectionPropagator(model, variables, cfg)
    bp.attach([core])
    bp.detach()

    for bid, (k0, s0, ids0) in before.items():
        b = core.memory.buckets[bid]
        assert int(b.size) == s0 and list(b.obj_ids) == ids0
        np.testing.assert_array_equal(np.asarray(b.key)[:s0], k0[:s0])
    np.testing.assert_array_equal(np.asarray(core.memory.sensory), sensory0)


def test_masked_writes_diverged_cadence():
    """Videos whose memory-write schedules have diverged (one video's extra
    detection reset its cadence, reference:inference_core.py:232-234) step
    through MASKED-write launches: each video writes at its own cadence
    inside the shared batch, matching the sequential flow."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=3, top_k=8, enable_long_term=False,
                          max_missed_detection_count=3, topk_method="exact")
    t = 7
    extra_det_ti = 2  # video 0 only: resets its cadence mid-run
    rng = np.random.default_rng(31)
    vids = [_video(rng, t), _video(rng, t)]

    def run_one_sequential(vi):
        frames, det_masks, det_infos = vids[vi]
        core = InferenceCore(model, variables, cfg)
        core.enabled_long_id()
        probs = []
        for ti in range(t):
            if ti == 0 or (vi == 0 and ti == extra_det_ti):
                p = core.incorporate_detection(frames[ti], det_masks[ti],
                                               _segs(det_infos[ti]))
            else:
                p = core.step(frames[ti], None, None)
            probs.append(np.asarray(p))
        return probs, core

    seq = [run_one_sequential(vi) for vi in range(2)]

    cores = []
    for frames, det_masks, det_infos in vids:
        core = InferenceCore(model, variables, cfg)
        core.enabled_long_id()
        core.incorporate_detection(frames[0], det_masks[0],
                                   _segs(det_infos[0]))
        cores.append(core)
    bp = BatchedDetectionPropagator(model, variables, cfg)
    bp.attach(cores)
    got = [[np.asarray(seq[vi][0][0])] for vi in range(2)]
    for ti in range(1, t):
        if ti == extra_det_ti:
            # mixed event: video 0 incorporates, video 1 plain-steps —
            # both through their own cores, then re-attach
            bp.detach()
            p0 = cores[0].incorporate_detection(
                vids[0][0][ti], vids[0][1][ti], _segs(vids[0][2][ti]))
            p1 = cores[1].step(vids[1][0][ti], None, None)
            got[0].append(np.asarray(p0))
            got[1].append(np.asarray(p1))
            bp.attach(cores)
        else:
            probs = bp.step_all([v[0][ti] for v in vids])
            for vi in range(2):
                n = cores[vi].object_manager.num_obj
                got[vi].append(np.asarray(probs[vi][:n + 1]))
    bp.detach()

    # the diverged schedules really produced masked-write launches
    assert any(k[-1] for k in bp._fns), "no masked-write variant compiled"
    for vi in range(2):
        sc = seq[vi][1]
        assert cores[vi].last_mem_ti == sc.last_mem_ti, vi
        s_b = {bid: (b.size, len(b.obj_ids))
               for bid, b in sc.memory.buckets.items()}
        b_b = {bid: (b.size, len(b.obj_ids))
               for bid, b in cores[vi].memory.buckets.items()}
        assert s_b == b_b, (vi, s_b, b_b)
        for ti in range(t):
            r, o = seq[vi][0][ti], got[vi][ti]
            assert r.shape == o.shape, (vi, ti, r.shape, o.shape)
            budget = 0.02 if ti < 6 else 0.05
            bad = (np.abs(o - r) > 5e-3).any(axis=0)
            assert bad.mean() <= budget, \
                f"video {vi} frame {ti}: {bad.mean():.2%} pixels differ"
            flips = o.argmax(0) != r.argmax(0)
            assert flips.mean() <= budget, \
                f"video {vi} frame {ti}: argmax {flips.mean():.2%}"


def test_batched_lt_equals_sequential():
    """Long-term memory under multi-bucket batching: consolidation +
    usage counting + eviction fire INSIDE the attached lockstep stepping
    and must match the sequential single-video path
    (reference:deva/inference/memory_manager.py:207-276)."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    # hw = 24 tokens/frame; writes every frame; consolidation at 4 writes;
    # LT cap 24 with 8 prototypes -> eviction at the 3rd consolidation
    cfg = InferenceConfig(mem_every=1, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=8, max_long_term_elements=24,
                          max_missed_detection_count=5,
                          topk_method="exact")
    det_every = 4
    t = 12
    rng = np.random.default_rng(23)
    vids = [_video(rng, t), _video(rng, t, third_at=det_every)]

    seq, seq_cores = _run_sequential(model, variables, cfg, vids,
                                     det_every)
    got, cores = _run_batched(model, variables, cfg, vids, det_every)

    # long-term state really exercised (consolidations + eviction ran)
    assert any(lt.size > 0 for c in seq_cores
               for lt in c.memory.long_buckets.values())
    for vi, (sc, bc) in enumerate(zip(seq_cores, cores)):
        s_b = {bid: (b.size, len(b.obj_ids))
               for bid, b in sc.memory.buckets.items()}
        b_b = {bid: (b.size, len(b.obj_ids))
               for bid, b in bc.memory.buckets.items()}
        assert s_b == b_b, (vi, s_b, b_b)
        s_lt = {bid: lt.size for bid, lt in sc.memory.long_buckets.items()}
        b_lt = {bid: lt.size for bid, lt in bc.memory.long_buckets.items()}
        assert s_lt == b_lt, (vi, s_lt, b_lt)

    for vi in range(len(vids)):
        for ti in range(t):
            r, o = seq[vi][ti], got[vi][ti]
            assert r.shape == o.shape, (vi, ti, r.shape, o.shape)
            # same budgets as test_batched_detection_equals_sequential,
            # slightly wider tail: the LT recurrence (usage -> prototype
            # selection -> readout) compounds schedule float noise longer
            budget = 0.02 if ti < 6 else 0.06
            bad = (np.abs(o - r) > 5e-3).any(axis=0)
            assert bad.mean() <= budget, \
                f"video {vi} frame {ti}: {bad.mean():.2%} pixels differ"
            flips = o.argmax(0) != r.argmax(0)
            assert flips.mean() <= budget, \
                f"video {vi} frame {ti}: argmax {flips.mean():.2%}"


def test_step_block_equals_step_all():
    """K-frame block launches (lax.scan read frames + one possibly-masked
    write frame) must match per-frame step_all stepping — including
    diverged per-video cadences and long-term consolidation."""
    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=3, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=8, max_missed_detection_count=5,
                          topk_method="exact")
    t = 10
    rng = np.random.default_rng(41)
    vids = [_video(rng, t), _video(rng, t, third_at=0)]

    def make_cores():
        cores = []
        for frames, det_masks, det_infos in vids:
            core = InferenceCore(model, variables, cfg)
            core.enabled_long_id()
            core.incorporate_detection(frames[0], det_masks[0],
                                       _segs(det_infos[0]))
            cores.append(core)
        # diverge the cadences: video 0 takes one extra single step
        cores[0].step(vids[0][0][1], None, None)
        cores[0].last_mem_ti = 1  # as if a detection reset it at ti=1
        cores[1].step(vids[1][0][1], None, None)
        return cores

    cores_a = make_cores()
    bp_a = BatchedDetectionPropagator(model, variables, cfg)
    bp_a.attach(cores_a)
    probs_a = []
    for ti in range(2, t):
        probs_a.append(np.asarray(
            bp_a.step_all([v[0][ti] for v in vids])))
    bp_a.detach()

    cores_b = make_cores()
    bp_b = BatchedDetectionPropagator(model, variables, cfg)
    bp_b.attach(cores_b)
    probs_b = []
    ti = 2
    while ti < t:
        k = bp_b.plan_block(min(cfg.mem_every, t - ti))
        frames = [np.stack([v[0][ti + i] for i in range(k)]) for v in vids]
        out = np.asarray(bp_b.step_block(frames))
        for i in range(k):
            probs_b.append(out[:, i])
        ti += k
    bp_b.detach()

    assert any(k[0] == "block" and k[2] > 0 for k in bp_b._fns), \
        "no multi-frame (scanned) block compiled"
    np.testing.assert_array_equal(bp_a.sizes, bp_b.sizes)
    np.testing.assert_array_equal(bp_a.lt_sizes, bp_b.lt_sizes)
    np.testing.assert_array_equal(np.asarray(bp_a.last_mem_ti),
                                  np.asarray(bp_b.last_mem_ti))
    for i, (a, o) in enumerate(zip(probs_a, probs_b)):
        assert a.shape == o.shape
        bad = (np.abs(o - a) > 5e-3).any(axis=1)
        assert bad.mean() <= 0.02, f"frame {i}: {bad.mean():.2%} differ"


def test_multibucket_mesh_equals_unsharded():
    """BatchedDetectionPropagator with a 'data'-axis mesh must produce the
    same outputs and state as the unsharded propagator (per-video bodies
    have no cross-video terms; XLA partitions the launch with zero
    hot-path collectives)."""
    from deva_tpu.parallel.mesh import make_mesh

    model = DEVANetwork(ModelConfig())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 512)))
    cfg = InferenceConfig(mem_every=2, top_k=8, enable_long_term=True,
                          enable_long_term_count_usage=True,
                          max_mid_term_frames=4, min_mid_term_frames=2,
                          num_prototypes=8, max_missed_detection_count=5,
                          topk_method="exact")
    t = 6
    rng = np.random.default_rng(61)
    vids = [_video(rng, t, third_at=1), _video(rng, t)]

    def make_cores():
        cores = []
        for frames, det_masks, det_infos in vids:
            core = InferenceCore(model, variables, cfg)
            core.enabled_long_id()
            core.incorporate_detection(frames[0], det_masks[0],
                                       _segs(det_infos[0]))
            core.incorporate_detection(frames[1], det_masks[1],
                                       _segs(det_infos[1]))
            cores.append(core)
        return cores

    def run(mesh):
        cores = make_cores()
        bp = BatchedDetectionPropagator(model, variables, cfg, mesh=mesh)
        bp.attach(cores)
        out = []
        ti = 2
        while ti < t:
            k = bp.plan_block(min(cfg.mem_every, t - ti))
            frames = [np.stack([v[0][ti + i] for i in range(k)])
                      for v in vids]
            probs = np.asarray(bp.step_block(frames))
            for i in range(k):
                out.append(probs[:, i])
            ti += k
        bp.detach()
        return out, bp

    ref_out, ref_bp = run(None)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    mesh_out, mesh_bp = run(mesh)

    np.testing.assert_array_equal(ref_bp.sizes, mesh_bp.sizes)
    for a, o in zip(ref_out, mesh_out):
        bad = (np.abs(o - a) > 5e-3).any(axis=1)
        assert bad.mean() <= 0.02, f"{bad.mean():.2%} pixels differ"


def test_step_block_end_freezes_sensory():
    """step_block(end=True) must freeze sensory on the final frame exactly
    like per-frame step_all(end=True) (reference end-of-video semantics:
    update_sensory = not is_last_frame)."""
    model = DEVANetwork(ModelConfig(pix_feat_dim=64, key_dim=16,
                                    value_dim=32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 1, 32, 32)),
                           jnp.zeros((1, 1, 2, 2, 32)))
    cfg = InferenceConfig(mem_every=5, top_k=4, enable_long_term=False,
                          max_missed_detection_count=5, topk_method="exact")
    t = 4
    rng = np.random.default_rng(43)
    vids = [_video(rng, t), _video(rng, t)]

    def make_cores():
        cores = []
        for frames, det_masks, det_infos in vids:
            core = InferenceCore(model, variables, cfg)
            core.enabled_long_id()
            core.incorporate_detection(frames[0], det_masks[0],
                                       _segs(det_infos[0]))
            cores.append(core)
        return cores

    cores_a = make_cores()
    bp_a = BatchedDetectionPropagator(model, variables, cfg)
    bp_a.attach(cores_a)
    pa = [np.asarray(bp_a.step_all([v[0][ti] for v in vids],
                                   end=(ti == t - 1)))
          for ti in range(1, t)]
    bp_a.detach()

    cores_b = make_cores()
    bp_b = BatchedDetectionPropagator(model, variables, cfg)
    bp_b.attach(cores_b)
    frames = [np.stack([v[0][ti] for ti in range(1, t)]) for v in vids]
    out = np.asarray(bp_b.step_block(frames, end=True))
    bp_b.detach()

    for i in range(t - 1):
        np.testing.assert_allclose(out[:, i], pa[i], atol=1e-4)
    for ca, cb in zip(cores_a, cores_b):
        np.testing.assert_allclose(np.asarray(cb.memory.sensory),
                                   np.asarray(ca.memory.sensory), atol=1e-4)
