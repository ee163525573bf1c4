"""Differential tests for remaining edge paths: soft-mask seeded propagation
(referring/saliency), incremental detection fusion (automatic mode), and the
max_num_objects denial."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.object_info import ObjectInfo
from deva_tpu.models.network import DEVANetwork

from helpers_ref import build_reference_deva, converted_variables

H, W = 64, 96


@pytest.fixture(scope="module")
def setup():
    ref_net = build_reference_deva(seed=0)
    variables = converted_variables(ref_net)
    model = DEVANetwork(ModelConfig())
    return ref_net, model, variables


def _frames(rng, t):
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    return [np.kron(base + 0.1 * rng.standard_normal((H // 8, W // 8, 3)),
                    np.ones((8, 8, 1))).astype(np.float32)
            for _ in range(t)]


def _cfg_pair(**over):
    rc = {"pix_feat_dim": 512, "key_dim": 64, "value_dim": 512,
          "mem_every": 2, "top_k": 8, "chunk_size": -1,
          "enable_long_term": False, "enable_long_term_count_usage": False,
          "max_mid_term_frames": 4, "min_mid_term_frames": 2,
          "num_prototypes": 16, "max_long_term_elements": 96,
          "max_missed_detection_count": 1, "max_num_objects": -1}
    rc.update(over)
    oc = InferenceConfig(
        mem_every=rc["mem_every"], top_k=rc["top_k"],
        enable_long_term=rc["enable_long_term"],
        max_mid_term_frames=rc["max_mid_term_frames"],
        min_mid_term_frames=rc["min_mid_term_frames"],
        num_prototypes=rc["num_prototypes"],
        max_long_term_elements=rc["max_long_term_elements"],
        max_missed_detection_count=rc["max_missed_detection_count"],
        max_num_objects=rc["max_num_objects"])
    return rc, oc


def _close(r, o, ti, budget=0.002):
    r, o = np.asarray(r), np.asarray(o)
    assert r.shape == o.shape, (ti, r.shape, o.shape)
    bad = (np.abs(o - r) > 3e-3).any(axis=0)
    assert bad.mean() <= budget, f"frame {ti}: {bad.mean():.2%}"


def test_soft_mask_seeded_propagation(setup):
    """step(mask, hard_mask=False) with image_ti_override + delete_buffer
    False — the referring/saliency propagation pattern."""
    from deva.inference.inference_core import DEVAInferenceCore
    ref_net, model, variables = setup
    rc, oc = _cfg_pair()
    rng = np.random.default_rng(31)
    frames = _frames(rng, 5)
    soft = np.zeros((2, H, W), np.float32)
    soft[0, 8:28, 10:40] = 0.9
    soft[1, 36:60, 50:90] = 0.8

    ref_core = DEVAInferenceCore(ref_net, config=rc)
    our_core = InferenceCore(model, variables, oc)
    with torch.no_grad():
        for ti, img in enumerate(frames):
            t_img = torch.from_numpy(np.moveaxis(img, -1, 0)).contiguous()
            if ti == 0:
                rp = ref_core.step(t_img, torch.from_numpy(soft),
                                   hard_mask=False, image_ti_override=10,
                                   delete_buffer=False)
                op = our_core.step(img, soft, hard_mask=False,
                                   image_ti_override=10, delete_buffer=False)
            else:
                rp = ref_core.step(t_img, image_ti_override=10 + ti,
                                   delete_buffer=False)
                op = our_core.step(img, image_ti_override=10 + ti,
                                   delete_buffer=False)
            _close(rp.numpy(), op, ti)


def test_incremental_detection_and_purge(setup):
    """incorporate_detection(incremental=True): visible objects keep living
    even when unsupported; invisible ones get poked and purged."""
    from deva.inference.inference_core import DEVAInferenceCore
    from deva.inference.object_info import ObjectInfo as RefObjectInfo
    ref_net, model, variables = setup
    rc, oc = _cfg_pair(max_missed_detection_count=0)
    rng = np.random.default_rng(32)
    frames = _frames(rng, 6)

    det0 = np.zeros((H, W), np.int64)
    det0[8:28, 10:40] = 1
    det0[36:60, 50:90] = 2
    det_later = np.zeros((H, W), np.int64)
    det_later[10:30, 12:42] = 3  # only overlaps object 1's region

    ref_core = DEVAInferenceCore(ref_net, config=rc)
    our_core = InferenceCore(model, variables, oc)
    with torch.no_grad():
        for ti, img in enumerate(frames):
            t_img = torch.from_numpy(np.moveaxis(img, -1, 0)).contiguous()
            if ti % 3 == 0:
                det = det0 if ti == 0 else det_later
                r_si = [RefObjectInfo(id=i, isthing=True)
                        for i in np.unique(det) if i != 0]
                o_si = [ObjectInfo(id=int(i)) for i in np.unique(det)
                        if i != 0]
                for o in o_si:
                    o.isthing = True
                rp = ref_core.incorporate_detection(
                    t_img, torch.from_numpy(det), r_si, incremental=True)
                op = our_core.incorporate_detection(img, det, o_si,
                                                    incremental=True)
                rp = torch.softmax(rp, 0).numpy()
                o = np.asarray(op)
                op = np.exp(o - o.max(0)) / np.exp(o - o.max(0)).sum(0)
            else:
                rp = ref_core.step(t_img).numpy()
                op = np.asarray(our_core.step(img))
            _close(rp, op, ti, budget=0.004)
    assert (ref_core.object_manager.num_obj ==
            our_core.object_manager.num_obj)
    ref_pokes = sorted(o.poke_count
                       for o in ref_core.object_manager.obj_to_tmp_id)
    our_pokes = sorted(o.poke_count
                       for o in our_core.object_manager.obj_to_tmp_id)
    assert ref_pokes == our_pokes


def test_max_num_objects_denial(setup):
    """Global object cap: new detections are discarded when the total would
    exceed max_num_objects (reference:segment_merging.py:115-121)."""
    from deva.inference.inference_core import DEVAInferenceCore
    from deva.inference.object_info import ObjectInfo as RefObjectInfo
    ref_net, model, variables = setup
    rc, oc = _cfg_pair(max_num_objects=2, max_missed_detection_count=99)
    rng = np.random.default_rng(33)
    frames = _frames(rng, 3)

    det0 = np.zeros((H, W), np.int64)
    det0[8:28, 10:40] = 1
    det0[36:60, 50:90] = 2
    det1 = np.zeros((H, W), np.int64)
    det1[2:18, 60:88] = 7  # a third object: must be denied

    ref_core = DEVAInferenceCore(ref_net, config=rc)
    our_core = InferenceCore(model, variables, oc)
    with torch.no_grad():
        for ti, (det, si_ids) in enumerate([(det0, [1, 2]), (det1, [7])]):
            t_img = torch.from_numpy(
                np.moveaxis(frames[ti], -1, 0)).contiguous()
            with pytest.warns(UserWarning) if ti == 1 else _nullcontext():
                ref_core.incorporate_detection(
                    t_img, torch.from_numpy(det),
                    [RefObjectInfo(id=i) for i in si_ids])
            with pytest.warns(UserWarning) if ti == 1 else _nullcontext():
                our_core.incorporate_detection(
                    frames[ti], det, [ObjectInfo(id=i) for i in si_ids])
    assert ref_core.object_manager.num_obj == 2
    assert our_core.object_manager.num_obj == 2


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_fault_barrier_reraises_programming_errors():
    """Per-video fault isolation swallows data errors (one poisoned video
    must not kill a benchmark run) but re-raises programming errors, which
    hit every video identically — swallowing a NameError once produced an
    exit-0 run with no output (eval_ref_davis obj_mesh scoping bug)."""
    from deva_tpu.inference.eval_args import video_fault_barrier

    with video_fault_barrier("vid"):
        raise ValueError("bad frame data")  # swallowed

    import pytest as _pytest
    with _pytest.raises(NameError):
        with video_fault_barrier("vid"):
            raise NameError("undefined")
    with _pytest.raises(ValueError):
        with video_fault_barrier("vid", reraise=True):
            raise ValueError("raise_on_error")
