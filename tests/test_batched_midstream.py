"""Mid-stream mask insertion under batched VOS serving.

YouTubeVOS-style videos receive ground-truth masks after the first frame
(new-object introduction) and may not be annotated until several frames in.
The batched driver routes such videos through the multi-bucket masked-write
propagator (evaluation/eval_vos_batched.py run_group_midstream); outputs
must match the strictly-sequential reference flow
(reference:evaluation/eval_vos.py:110-160 with use_all_masks), with
long-term memory ON in both (lockstep consolidation fires in-driver on the
batched side).
"""
import os
import runpy
import sys
from os import path

import numpy as np
from PIL import Image

HERE = path.dirname(path.abspath(__file__))
REPO = path.dirname(HERE)

H, W = 64, 96

_PALETTE = [0, 0, 0, 128, 0, 0, 0, 128, 0, 0, 0, 128] + [0] * (256 * 3 - 12)


def _write_video(root, name, t, rng, mask_frames):
    """mask_frames: {frame_index: mask array (uint8 labels)}."""
    img_dir = path.join(root, "JPEGImages", name)
    ann_dir = path.join(root, "Annotations", name)
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    base = rng.integers(0, 200, (H // 8, W // 8, 3)).astype(np.float32)
    for ti in range(t):
        img = base + rng.integers(0, 40, (H // 8, W // 8, 3))
        img = np.kron(img, np.ones((8, 8, 1))).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(path.join(img_dir, f"{ti:05d}.png"))
    for ti, mask in mask_frames.items():
        m = Image.fromarray(mask.astype(np.uint8), mode="P")
        m.putpalette(_PALETTE)
        m.save(path.join(ann_dir, f"{ti:05d}.png"))


def _mask(*objs):
    """objs: (label, slice_y, slice_x) regions."""
    m = np.zeros((H, W), np.uint8)
    for label, sy, sx in objs:
        m[sy, sx] = label
    return m


def _run_driver(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(path.join(REPO, "evaluation", script),
                       run_name="__main__")
    finally:
        sys.argv = old


def _load_masks(out_dir):
    masks = {}
    for vid in sorted(os.listdir(out_dir)):
        vd = path.join(out_dir, vid)
        if not path.isdir(vd):
            continue
        for f in sorted(os.listdir(vd)):
            masks[f"{vid}/{f}"] = np.asarray(Image.open(path.join(vd, f)))
    return masks


def test_midstream_driver_equals_sequential(tmp_path):
    rng = np.random.default_rng(17)
    data = tmp_path / "data"
    obj1 = (1, slice(8, 28), slice(10, 40))
    obj2 = (2, slice(36, 60), slice(50, 90))
    obj3 = (3, slice(2, 18), slice(60, 88))
    # vid_a: object 1 at frame 0, object 2 introduced at frame 3 (the
    # YouTubeVOS convention: later annotation PNGs contain ONLY the newly
    # introduced objects — a re-annotated existing label would mint a
    # duplicate object with a RANDOM id in the reference,
    # reference:deva/inference/object_manager.py:40-53, making outputs
    # nondeterministic). The introduction forces a memory write and resets
    # vid_a's cadence mid-group.
    _write_video(str(data), "vid_a", 10, rng,
                 {0: _mask(obj1), 3: _mask(obj2)})
    # vid_b: first mask arrives at frame 2 (prefix frames are skipped), a
    # third object appears at frame 5; shorter than vid_a (replay+discard)
    _write_video(str(data), "vid_b", 9, rng,
                 {2: _mask(obj2), 5: _mask(obj3)})
    # vid_c: plain first-frame-only video — must still take the
    # single-bucket lockstep path (routing must not regress it)
    _write_video(str(data), "vid_c", 10, rng, {0: _mask(obj1, obj2)})

    # long-term memory ON in both drivers, with a tiny config (hw=24
    # tokens/frame, writes every 2nd frame, consolidation at 4 writes) so
    # lockstep consolidation AND multi-frame block launches (mem_every=2
    # -> scanned read frames) both fire inside the batched mid-stream run
    common = ["--dataset", "G", "--generic_path", str(data), "--model", "",
              "--size", "-1", "--mem_every", "2", "--top_k", "8",
              "--max_mid_term_frames", "4", "--min_mid_term_frames", "2",
              "--num_prototypes", "8", "--topk_method", "exact",
              "--use_all_masks"]
    seq_out = str(tmp_path / "seq")
    bat_out = str(tmp_path / "bat")
    _run_driver("eval_vos.py", common + ["--output", seq_out])
    _run_driver("eval_vos_batched.py",
                common + ["--output", bat_out, "--batch", "2"])

    seq = _load_masks(seq_out)
    bat = _load_masks(bat_out)
    assert sorted(seq) == sorted(bat), "output file sets differ"
    # vid_b's pre-first-mask frames must not be emitted by either driver
    assert "vid_b/00000.png" not in seq
    for name in sorted(seq):
        a, b = seq[name], bat[name]
        assert a.shape == b.shape
        # random-init outputs are near-uniform, so allow a small near-tie
        # flip budget (same rationale as test_batched_driver)
        frac = (a != b).mean()
        assert frac <= 0.05, f"{name}: {frac:.2%} pixels differ"
