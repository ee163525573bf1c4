"""Differential tests for the detection-fusion layer vs the reference:
segment matching/merging, incorporate_detection, in-clip consensus with the
integer program, and the semi-online state machine.

The reference's pulp solver is unavailable; we patch its solver hook with
deva_tpu's exact independent-set solver (same integer program,
reference:consensus_automatic.py:55-79), so both sides optimize identically.
Object ids are compared structurally (tmp-ordered probabilities), not by
value, since id collisions re-draw from different RNGs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.frame_utils import FrameInfo
from deva_tpu.inference.ilp import solve_consensus_ilp
from deva_tpu.inference.object_info import ObjectInfo
from deva_tpu.inference.object_utils import convert_json_dict_to_objects_info
from deva_tpu.models.network import DEVANetwork

from helpers_ref import build_reference_deva, converted_variables

H, W = 64, 96


def _patch_reference_solver():
    import deva.inference.consensus_automatic as ca
    ca.use_gurobi = False
    ca.solve_with_pulp = lambda iou, ind, n: solve_consensus_ilp(
        iou, ind.astype(bool))


def _synthetic_detections(rng, t=7):
    """Frames + per-frame detection id-masks of 2 moving boxes + 1 appearing
    box, with VIPSeg-style segments_info dicts."""
    frames, det_masks, det_infos = [], [], []
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    for i in range(t):
        img = base + 0.1 * rng.standard_normal((H // 8, W // 8, 3))
        frames.append(np.kron(img, np.ones((8, 8, 1))).astype(np.float32))
        m = np.zeros((H, W), np.int64)
        dx = 2 * i
        m[8:28, 10 + dx:40 + dx] = 1
        m[36:60, 50:90] = 2
        info = [
            {"id": 1, "isthing": 1, "category_id": 5},
            {"id": 2, "isthing": 1, "category_id": 7},
        ]
        if i >= 3:
            m[2:18, 60:88] = 3
            info.append({"id": 3, "isthing": 0, "category_id": 20})
        det_masks.append(m)
        det_infos.append(info)
    return frames, det_masks, det_infos


def _ref_config():
    return {
        "pix_feat_dim": 512, "key_dim": 64, "value_dim": 512,
        "mem_every": 2, "top_k": 8, "chunk_size": -1,
        "enable_long_term": False, "enable_long_term_count_usage": False,
        "max_mid_term_frames": 4, "min_mid_term_frames": 2,
        "num_prototypes": 16, "max_long_term_elements": 96,
        "max_missed_detection_count": 2, "max_num_objects": -1,
    }


def _our_config(rc):
    return InferenceConfig(
        mem_every=rc["mem_every"], top_k=rc["top_k"],
        enable_long_term=rc["enable_long_term"],
        enable_long_term_count_usage=rc["enable_long_term_count_usage"],
        max_mid_term_frames=rc["max_mid_term_frames"],
        min_mid_term_frames=rc["min_mid_term_frames"],
        num_prototypes=rc["num_prototypes"],
        max_long_term_elements=rc["max_long_term_elements"],
        max_missed_detection_count=rc["max_missed_detection_count"],
        max_num_objects=rc["max_num_objects"])


@pytest.fixture(scope="module")
def setup():
    _patch_reference_solver()
    ref_net = build_reference_deva(seed=0)
    variables = converted_variables(ref_net)
    model = DEVANetwork(ModelConfig())
    return ref_net, model, variables


def _seg_infos(info_dicts, dataset=None):
    ours = convert_json_dict_to_objects_info(None, info_dicts,
                                             dataset=dataset)
    # reference ObjectInfos (isthing from the raw flag for the test)
    from deva.inference.object_info import ObjectInfo as RefObjectInfo
    refs = []
    for d, o in zip(info_dicts, ours):
        r = RefObjectInfo(id=d["id"], category_id=d["category_id"],
                          isthing=bool(d["isthing"]))
        refs.append(r)
        o.isthing = bool(d["isthing"])
    return refs, ours


def _compare_prob(r, o, ti, atol=3e-3, hard_pixel_budget=0.0002):
    """Detection frames produce HARD (0/1) merged masks, so a single
    boundary-tie flip upstream becomes a |diff|=1 pixel; allow a tiny pixel
    budget for those, plus the usual soft tolerance elsewhere."""
    r = np.asarray(r)
    o = np.asarray(o)
    assert r.shape == o.shape, (ti, r.shape, o.shape)
    bad = np.abs(o - r) > atol
    frac = bad.any(axis=0).mean()
    assert frac <= hard_pixel_budget, (
        f"frame {ti}: {frac:.2%} pixels differ beyond atol")
    diff = o.argmax(0) != r.argmax(0)
    assert diff.mean() <= hard_pixel_budget, (
        f"argmax frame {ti}: {diff.mean():.2%} mismatched")


def test_online_incorporate_detection_parity(setup):
    """Online mode: incorporate_detection every 3 frames, step otherwise.
    Exercises match_and_merge, poking/purging, multi-bucket memory."""
    ref_net, model, variables = setup
    from deva.inference.inference_core import DEVAInferenceCore
    rng = np.random.default_rng(3)
    frames, det_masks, det_infos = _synthetic_detections(rng, t=7)
    rc = _ref_config()
    ref_core = DEVAInferenceCore(ref_net, config=rc)
    our_core = InferenceCore(model, variables, _our_config(rc))

    with torch.no_grad():
        for ti, img in enumerate(frames):
            t_img = torch.from_numpy(np.moveaxis(img, -1, 0)).contiguous()
            if ti % 3 == 0:
                ref_si, our_si = _seg_infos(det_infos[ti])
                rp = ref_core.incorporate_detection(
                    t_img, torch.from_numpy(det_masks[ti]), ref_si)
                op = our_core.incorporate_detection(img, det_masks[ti],
                                                    our_si)
                # logits: compare softmax instead
                rp = torch.softmax(rp, dim=0).numpy()
                op = np.asarray(jnp.asarray(op))
                op = np.exp(op - op.max(0)) / np.exp(
                    op - op.max(0)).sum(0)
            else:
                rp = ref_core.step(t_img).numpy()
                op = np.asarray(our_core.step(img))
            _compare_prob(rp, op, ti)

    # id values re-drawn on collision come from different RNGs; compare the
    # object-table structure instead
    ref_objs = list(ref_core.object_manager.obj_to_tmp_id)
    our_objs = list(our_core.object_manager.obj_to_tmp_id)
    assert len(ref_objs) == len(our_objs)
    assert [o.poke_count for o in ref_objs] == \
        [o.poke_count for o in our_objs]
    assert [o.isthing for o in ref_objs] == [o.isthing for o in our_objs]


def test_semionline_consensus_parity(setup):
    """Semi-online: buffer 3 frames, vote (consensus + ILP), incorporate,
    propagate the rest. reference:evaluation/eval_with_detections.py:205-265."""
    ref_net, model, variables = setup
    from deva.inference.inference_core import DEVAInferenceCore
    from deva.inference.frame_utils import FrameInfo as RefFrameInfo

    rng = np.random.default_rng(4)
    frames, det_masks, det_infos = _synthetic_detections(rng, t=6)
    rc = _ref_config()
    ref_core = DEVAInferenceCore(ref_net, config=rc)
    our_core = InferenceCore(model, variables, _our_config(rc))

    num_voting = 3
    detection_every = 3
    next_voting_frame = num_voting - 1
    vid_length = len(frames)

    with torch.no_grad():
        for ti, img in enumerate(frames):
            t_img = torch.from_numpy(np.moveaxis(img, -1, 0)).contiguous()
            ref_si, our_si = _seg_infos(det_infos[ti])
            info = {"frame": f"{ti:05d}.jpg", "shape": (H, W), "save": True,
                    "path_to_image": None}
            if ti + num_voting > next_voting_frame:
                ref_core.add_to_temporary_buffer(
                    RefFrameInfo(t_img, torch.from_numpy(det_masks[ti]),
                                 ref_si, ti, {k: [v] for k, v in
                                              info.items()}))
                our_core.add_to_temporary_buffer(
                    FrameInfo(img, det_masks[ti], our_si, ti, info))
                if ti == next_voting_frame:
                    _, r_mask, r_info = ref_core.vote_in_temporary_buffer(
                        keyframe_selection="first")
                    _, o_mask, o_info = our_core.vote_in_temporary_buffer(
                        keyframe_selection="first")
                    # consensus masks use identical internal ids
                    np.testing.assert_array_equal(o_mask, r_mask.numpy())
                    assert [o.id for o in o_info] == [r.id for r in r_info]

                    rp = ref_core.incorporate_detection(
                        ref_core.frame_buffer[0].image, r_mask, r_info)
                    op = our_core.incorporate_detection(
                        our_core.frame_buffer[0].image, o_mask, o_info)
                    _compare_prob(torch.softmax(rp, 0).numpy(),
                                  np.asarray(jax_softmax(op)), ti)
                    next_voting_frame += detection_every
                    if next_voting_frame >= vid_length:
                        next_voting_frame = vid_length + num_voting
                    for rfi, ofi in zip(ref_core.frame_buffer[1:],
                                        our_core.frame_buffer[1:]):
                        rp = ref_core.step(rfi.image,
                                           end=(rfi.ti == vid_length - 1))
                        op = our_core.step(ofi.image,
                                           end=(ofi.ti == vid_length - 1))
                        _compare_prob(rp.numpy(), np.asarray(op), ofi.ti)
                    ref_core.clear_buffer()
                    our_core.clear_buffer()
            else:
                rp = ref_core.step(t_img, end=(ti == vid_length - 1))
                op = our_core.step(img, end=(ti == vid_length - 1))
                _compare_prob(rp.numpy(), np.asarray(op), ti)


def jax_softmax(logits):
    x = np.asarray(logits)
    e = np.exp(x - x.max(0))
    return e / e.sum(0)


def test_ilp_matches_bruteforce():
    """The consensus integer program solved exactly: compare against brute
    force on random small instances."""
    rng = np.random.default_rng(0)
    for trial in range(30):
        n = int(rng.integers(1, 10))
        iou = np.zeros((n, n), np.float32)
        for i in range(n):
            for j in range(i + 1, n):
                if rng.uniform() < 0.4:
                    iou[i, j] = rng.uniform(0.5, 1.0)
        iou = iou + iou.T
        conflict = iou > 0.49
        sel = solve_consensus_ilp(iou, conflict)
        got = _objective(iou, sel)
        best = max(_objective(iou, _bits(m, n))
                   for m in range(2 ** n)
                   if _feasible(conflict, _bits(m, n)))
        assert abs(got - best) < 1e-6, (trial, got, best)
        assert _feasible(conflict, sel)


def _bits(m, n):
    return [(m >> i) & 1 == 1 for i in range(n)]


def _feasible(conflict, sel):
    idx = [i for i, s in enumerate(sel) if s]
    return not any(conflict[i, j] for i in idx for j in idx if i != j)


def _objective(iou, sel):
    # the reference's objective: 2*(sym_iou @ x).sum() - x.sum()
    # (reference:consensus_automatic.py:38-43 after symmetrization at :237)
    x = np.asarray(sel, np.float32)[:, None]
    return float(2 * (iou @ x).sum() - x.sum())
