"""Generate golden-output regression fixtures from the reference DEVA.

Runs the reference implementation (torch CPU, fixed-seed random init — the
released checkpoint is not downloadable in this environment) on the two
vendored example clips and records its inputs and outputs:

  tests/fixtures/golden_vos.npz     — semi-supervised VOS propagation on
      reference:example/vos (bmx-trees, 4 frames, first-frame mask), the
      reference:evaluation/eval_vos.py:136-185 loop.
  tests/fixtures/golden_vipseg.npz  — semi-online detection fusion (voting,
      consensus ILP, incorporate_detection) on reference:example/vipseg,
      the reference:evaluation/eval_with_detections.py:205-265 state machine.

tests/test_golden.py replays these through deva_tpu and asserts the masks
match, catching any behavioral drift without needing torch or the reference
at test time. Regenerate with:

  python scripts/make_golden_fixtures.py
"""
import json
import os
import sys
import types
from os import path

import numpy as np

REPO = path.dirname(path.dirname(path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

SEED = 0
SIZE = 240
FIXDIR = path.join(REPO, "tests", "fixtures")

# the reference imports pulp / pycocotools at module scope; neither is
# installed here (same stubbing as tests/conftest.py)
def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


_stub("pulp", LpProblem=None, LpMaximize=None, LpVariable=None, lpSum=None,
      PULP_CBC_CMD=None, LpStatus={})
_stub("pycocotools")
_stub("pycocotools.mask", encode=None, decode=None)

sys.path.insert(0, path.join(REPO, "tests"))
from helpers_ref import build_reference_deva  # noqa: E402

# -- the reference readers' transforms, re-implemented without torchvision
# (not installed here): ToTensor -> Normalize -> Resize(min-side, BILINEAR,
# antialias) for images, PIL NEAREST for masks
# (reference:deva/inference/data/video_reader.py:133-154) ------------------

IM_MEAN = (0.485, 0.456, 0.406)
IM_STD = (0.229, 0.224, 0.225)


def _resized_dims(h, w, size):
    # torchvision F.resize int-size semantics: min side -> size, other side
    # int(size * long / short)
    if h <= w:
        return size, int(size * w / h)
    return int(size * h / w), size


def load_ref_image(im_path, size):
    import torch
    from PIL import Image
    img = Image.open(im_path).convert("RGB")
    x = torch.from_numpy(np.asarray(img, np.uint8).copy())
    x = x.permute(2, 0, 1).float() / 255
    mean = torch.tensor(IM_MEAN)[:, None, None]
    std = torch.tensor(IM_STD)[:, None, None]
    x = (x - mean) / std
    if size > 0:
        nh, nw = _resized_dims(x.shape[-2], x.shape[-1], size)
        x = torch.nn.functional.interpolate(
            x[None], size=(nh, nw), mode="bilinear", align_corners=False,
            antialias=True)[0]
    return x


def load_ref_mask(mask_path, size):
    from PIL import Image
    m = Image.open(mask_path).convert("P")
    if size > 0:
        nh, nw = _resized_dims(m.size[1], m.size[0], size)
        m = m.resize((nw, nh), Image.NEAREST)
    return np.asarray(m)


def _ref_config(**over):
    cfg = {
        "pix_feat_dim": 512, "key_dim": 64, "value_dim": 512,
        "mem_every": 2, "top_k": 30, "chunk_size": -1,
        "enable_long_term": False, "enable_long_term_count_usage": False,
        "max_mid_term_frames": 10, "min_mid_term_frames": 5,
        "num_prototypes": 128, "max_long_term_elements": 10000,
        "max_missed_detection_count": 10, "max_num_objects": -1,
    }
    cfg.update(over)
    return cfg


def make_vos_golden(net):
    import torch
    from deva.inference.inference_core import DEVAInferenceCore

    vid = "bmx-trees"
    img_dir = path.join(REF, "example/vos/JPEGImages", vid)
    mask_dir = path.join(REF, "example/vos/Annotations", vid)
    frames = sorted(os.listdir(img_dir))
    core = DEVAInferenceCore(net, config=_ref_config())

    inputs, probs, masks = [], [], []
    mask0 = None
    with torch.no_grad():
        for ti, frame in enumerate(frames):
            # quantize to f16 BEFORE the forward pass so the stored f16
            # inputs are bit-identical to what the reference consumed — the
            # replay test then sees zero input-side noise
            image = load_ref_image(path.join(img_dir, frame),
                                   SIZE).half().float()
            mask = valid_labels = None
            mask_path = path.join(mask_dir, frame[:-4] + ".png")
            if path.exists(mask_path):
                m = load_ref_mask(mask_path, SIZE)
                mask = torch.LongTensor(np.asarray(m, np.int64))
                valid_labels = [int(v) for v in np.unique(m) if v != 0]
            if ti == 0:
                mask0 = np.asarray(mask.numpy(), np.uint8)
            prob = core.step(image, mask, valid_labels,
                             end=(ti == len(frames) - 1))
            out_mask = core.object_manager.tmp_to_obj_cls(
                torch.argmax(prob, dim=0))
            inputs.append(np.moveaxis(image.numpy(), 0, -1))
            probs.append(prob.numpy())
            masks.append(out_mask.numpy().astype(np.uint8))

    os.makedirs(FIXDIR, exist_ok=True)
    np.savez_compressed(
        path.join(FIXDIR, "golden_vos.npz"),
        seed=SEED, size=SIZE,
        inputs=np.stack(inputs).astype(np.float16),
        mask0=mask0,
        probs=np.stack(probs).astype(np.float16),
        masks=np.stack(masks))
    print(f"golden_vos.npz: {len(masks)} frames, "
          f"{probs[0].shape[0]} channels, shape {masks[0].shape}")


def make_vipseg_golden(net):
    import torch
    from deva.inference.inference_core import DEVAInferenceCore
    from deva.inference.frame_utils import FrameInfo
    from deva.inference.object_utils import convert_json_dict_to_objects_info
    import deva.inference.consensus_automatic as ca
    from deva_tpu.inference.ilp import solve_consensus_ilp

    # the reference solves the consensus integer program with gurobi/pulp;
    # substitute deva_tpu's exact branch-and-bound (same program, optimal)
    ca.use_gurobi = False
    ca.solve_with_pulp = lambda iou, ind, n: solve_consensus_ilp(
        iou, ind.astype(bool))

    src = path.join(REF, "example/vipseg/source")
    vid = sorted(os.listdir(src))[0]
    img_dir = path.join(REF, "example/vipseg/images", vid)
    det_dir = path.join(src, vid)
    frames = sorted(os.listdir(img_dir))
    cfg = _ref_config(max_missed_detection_count=5)
    core = DEVAInferenceCore(net, config=cfg)
    core.enabled_long_id()

    num_voting, detection_every = 3, 5
    next_voting_frame = num_voting - 1
    vid_length = len(frames)

    inputs, det_masks, det_jsons = [], [], []
    out = {}  # ti -> (prob argmax as obj-id mask)

    def record(ti, prob):
        out_mask = core.object_manager.tmp_to_obj_cls(
            torch.argmax(prob, dim=0))
        out[ti] = out_mask.numpy().astype(np.int64)

    with torch.no_grad():
        for ti in range(vid_length):
            frame = frames[ti]
            image = load_ref_image(path.join(img_dir, frame),
                                   SIZE).half().float()  # see make_vos_golden
            mask = torch.from_numpy(np.asarray(
                load_ref_mask(path.join(det_dir, frame[:-4] + ".png"), SIZE),
                np.int32))
            with open(path.join(det_dir, frame[:-4] + ".json")) as f:
                seg_json = json.load(f)
            segments_info = convert_json_dict_to_objects_info(
                mask, seg_json, dataset="demo")
            inputs.append(np.moveaxis(image.numpy(), 0, -1))
            det_masks.append(mask.numpy().astype(np.int64))
            det_jsons.append(json.dumps(seg_json))
            fi = FrameInfo(image, mask, segments_info, ti,
                           {"frame": [f"{ti:07d}.jpg"], "save": [True],
                            "shape": [tuple(mask.shape)],
                            "path_to_image": [None]})
            if ti + num_voting > next_voting_frame:
                core.add_to_temporary_buffer(fi)
                if ti == next_voting_frame:
                    _, c_mask, c_info = core.vote_in_temporary_buffer(
                        keyframe_selection="first")
                    prob = core.incorporate_detection(
                        core.frame_buffer[0].image, c_mask, c_info)
                    record(core.frame_buffer[0].ti, prob)
                    next_voting_frame += detection_every
                    if next_voting_frame >= vid_length:
                        next_voting_frame = vid_length + num_voting
                    for rfi in core.frame_buffer[1:]:
                        prob = core.step(rfi.image, None, None,
                                         end=(rfi.ti == vid_length - 1))
                        record(rfi.ti, prob)
                    core.clear_buffer()
            else:
                prob = core.step(image, None, None,
                                 end=(ti == vid_length - 1))
                record(ti, prob)

    tis = sorted(out)
    np.savez_compressed(
        path.join(FIXDIR, "golden_vipseg.npz"),
        seed=SEED, size=SIZE, vid=vid,
        num_voting=num_voting, detection_every=detection_every,
        mem_every=cfg["mem_every"],
        inputs=np.stack(inputs).astype(np.float16),
        det_masks=np.stack(det_masks),
        det_jsons=np.asarray(det_jsons),
        out_tis=np.asarray(tis),
        out_masks=np.stack([out[t] for t in tis]))
    print(f"golden_vipseg.npz: {vid}, {len(tis)} output frames, "
          f"shape {out[tis[0]].shape}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    net = build_reference_deva(seed=SEED)
    if which in ("all", "vos"):
        make_vos_golden(net)
    if which in ("all", "vipseg"):
        make_vipseg_golden(net)


if __name__ == "__main__":
    main()
