"""Batched semi-supervised VOS evaluation: videos are grouped into lockstep
batches and propagated B-at-a-time through one vmapped compiled launch per
frame (deva_tpu/inference/batched.py) — the TPU-native serving configuration.

The reference is strictly single-stream (reference:evaluation/eval_vos.py);
this driver produces the same per-frame outputs (the equivalence is tested
in tests/test_batched.py / tests/test_batched_driver.py) at a multiple of
the aggregate throughput: at batch 1 the fused step leaves most of the MXU
idle.

Grouping: videos are lockstepped only with videos of identical padded
resolution, the same object-count bucket, and the same long-term
usage-counting policy; videos whose ground-truth masks appear after the
first frame fall back to the sequential path (their mid-stream insertions
would break lockstep). Shorter videos replay their last frame until the
group ends; replayed outputs are discarded. `end` semantics (no memory
write / no sensory update on the final frame) only affect state consumed by
later frames, so discarding replayed outputs preserves exact per-frame
parity with the sequential driver.

Usage (smoke clip):
  python evaluation/eval_vos_batched.py --dataset G --generic_path \
      /root/reference/example/vos --output /tmp/out --model '' --batch 4
"""
from __future__ import annotations

import contextlib
import dataclasses
import os
import sys
import time
from argparse import ArgumentParser
from os import path

import numpy as np
from PIL import Image

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax

from deva_tpu.data.vos_test_datasets import (DAVISTestDataset,
                                             GeneralVOSTestDataset,
                                             YouTubeVOSTestDataset)
from deva_tpu.data.transforms import resize_prob_to
from deva_tpu.inference.batched import BatchedPropagator
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.result_saver import device_argmax_ids
from deva_tpu.utils.prefetch import Prefetcher
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config,
                                          report_max_memory, start_profile,
                                          stop_profile, video_fault_barrier)


def save_frame(out_path, vid_name, frame, prob, object_manager, palette,
               shape, need_resize):
    if not need_resize and not isinstance(prob, np.ndarray):
        # device fast path: pull argmax ids, not the f32 prob tensor
        # (16x less tunnel/PCIe traffic, no host-side reduction)
        argmax = device_argmax_ids(prob)
    else:
        prob = np.asarray(prob)
        if need_resize:
            prob = resize_prob_to(prob, tuple(shape))
        argmax = np.argmax(prob, axis=0)
    out_mask = object_manager.tmp_cls_to_obj_cls(argmax)
    this_out_path = path.join(out_path, vid_name)
    os.makedirs(this_out_path, exist_ok=True)
    out_img = Image.fromarray(out_mask.astype(np.uint8))
    if palette is not None:
        out_img.putpalette(palette)
    out_img.save(path.join(this_out_path, frame[:-4] + ".png"))


def run_sequential(model, variables, cfg, vid_reader, out_path,
                   save_all=False):
    """The reference-shaped single-stream path, for videos that cannot be
    lockstepped (mid-stream mask insertion)."""
    processor = InferenceCore(model, variables, cfg)
    first_mask_loaded = False
    n = 0
    for ti in range(len(vid_reader)):
        data = vid_reader[ti]
        mask = data.get("mask")
        if not first_mask_loaded:
            if mask is None:
                continue
            first_mask_loaded = True
        valid_labels = data.get("valid_labels")
        if valid_labels is not None:
            valid_labels = [int(v) for v in valid_labels]
        prob = processor.step(data["rgb"], mask, valid_labels,
                              end=(ti == len(vid_reader) - 1))
        n += 1
        info = data["info"]
        if save_all or info["save"]:
            save_frame(out_path, vid_reader.vid_name, info["frame"],
                       prob, processor.object_manager,
                       vid_reader.get_palette(), tuple(info["shape"]),
                       info["need_resize"])
    return n


def run_group(model, variables, cfg, readers, out_path, save_all=False):
    """Lockstep-propagate a group of same-shaped videos."""
    first = [r[0] for r in readers]
    images0 = [d["rgb"] for d in first]
    masks0 = [np.asarray(d["mask"], np.int64) for d in first]
    objects = [[int(v) for v in d["valid_labels"]] for d in first]

    bp = BatchedPropagator(model, variables, cfg)
    bp.initialize(images0, masks0, objects)

    for vi, (r, d) in enumerate(zip(readers, first)):
        info = d["info"]
        if save_all or info["save"]:
            # the first-frame output is the (hard) ground-truth mask itself
            prob = np.zeros((len(objects[vi]) + 1,) + masks0[vi].shape,
                            np.float32)
            for oi, obj in enumerate(objects[vi]):
                prob[oi + 1] = masks0[vi] == obj
            prob[0] = 1.0 - prob[1:].sum(0)
            save_frame(out_path, r.vid_name, info["frame"], prob,
                       bp.cores[vi].object_manager, r.get_palette(),
                       tuple(info["shape"]), info["need_resize"])

    lengths = [len(r) for r in readers]
    max_len = max(lengths)
    if not bp.use_lt:
        bp.reserve(max_len // cfg.mem_every + 2)
    last = list(images0)
    n = 0
    with contextlib.ExitStack() as stack:
        # per-video background decode: frame ti+1 loads while the chip
        # propagates frame ti (SURVEY §2.8 host<->device pipeline; the
        # reference's analog is DataLoader workers, eval_vos.py:122)
        iters = [iter(stack.enter_context(Prefetcher(r, start=1)))
                 for r in readers]
        for ti in range(1, max_len):
            datas = [next(iters[vi], None) if ti < lengths[vi] else None
                     for vi, r in enumerate(readers)]
            frames = []
            for vi, d in enumerate(datas):
                if d is not None:
                    last[vi] = d["rgb"]
                frames.append(last[vi])
            probs = bp.step_all(frames, end=(ti == max_len - 1))
            for vi, d in enumerate(datas):
                if d is None:
                    continue
                n += 1
                info = d["info"]
                if save_all or info["save"]:
                    save_frame(out_path, readers[vi].vid_name,
                               info["frame"],
                               probs[vi][:len(objects[vi]) + 1],
                               bp.cores[vi].object_manager,
                               readers[vi].get_palette(),
                               tuple(info["shape"]),
                               info["need_resize"])
    return n + len(readers)


def run_group_midstream(model, variables, cfg, readers, out_path,
                        save_all=False):
    """Lockstep a group of same-resolution videos whose ground-truth masks
    arrive mid-stream (YouTubeVOS-style object introduction). Plain
    propagation frames run as ONE masked-write batched launch per tick
    (per-video memory cadences — a mask insertion resets a video's
    schedule); ticks where any video receives a mask run sequentially
    through the per-video reference path (merge + forced write + possible
    new bucket), then the group re-attaches. Long-term memory (lockstep
    consolidation over the stacked multi-bucket slots) is fully supported
    by the propagator."""
    from deva_tpu.inference.batched_detection import \
        BatchedDetectionPropagator

    b = len(readers)
    cores = [InferenceCore(model, variables, cfg) for _ in range(b)]
    bp = BatchedDetectionPropagator(model, variables, cfg)
    lengths = [len(r) for r in readers]
    max_len = max(lengths)
    started = [False] * b
    last = [None] * b
    attached = []
    n = 0
    # mask arrival ticks are known up front (file-existence probe), so
    # non-event ticks batch into K-frame blocks (one compiled launch per
    # memory period — plan_block keeps writes on block-last frames)
    scheds = [set(t for t in r.mask_frame_indices() if t < lengths[vi])
              for vi, r in enumerate(readers)]
    event_ticks = sorted(set().union(*scheds))

    def save(vi, d, prob):
        info = d["info"]
        if save_all or info["save"]:
            save_frame(out_path, readers[vi].vid_name, info["frame"], prob,
                       cores[vi].object_manager, readers[vi].get_palette(),
                       tuple(info["shape"]), info["need_resize"])

    def fetch(iters, ti):
        datas = [next(iters[vi], None) if ti < lengths[vi] else None
                 for vi in range(b)]
        for vi, d in enumerate(datas):
            if d is not None:
                last[vi] = d["rgb"]
        return datas

    with contextlib.ExitStack() as stack:
        iters = [iter(stack.enter_context(Prefetcher(r, start=0)))
                 for r in readers]
        ti = 0
        while ti < max_len:
            if ti in event_ticks:
                datas = fetch(iters, ti)
                events = [vi for vi, d in enumerate(datas)
                          if d is not None and d.get("mask") is not None]
                # mask ticks: per-video reference path (merge / new bucket
                # / forced write); non-event started videos step through
                # their cores too so every clock advances exactly once
                if attached:
                    bp.detach()
                    attached = []
                for vi in range(b):
                    d = datas[vi]
                    if d is None or (vi not in events and not started[vi]):
                        continue
                    mask = d.get("mask") if vi in events else None
                    labels = [int(v) for v in d["valid_labels"]] \
                        if vi in events else None
                    prob = cores[vi].step(d["rgb"], mask, labels,
                                          end=(ti == lengths[vi] - 1))
                    started[vi] = True
                    n += 1
                    save(vi, d, prob)
                ti += 1
                continue

            active = [vi for vi in range(b) if started[vi]]
            if not active:
                fetch(iters, ti)  # keep iterators tick-aligned
                ti += 1
                continue
            if attached != active:
                if attached:
                    bp.detach()
                bp.attach([cores[vi] for vi in active])
                attached = active
            next_stop = min([t for t in event_ticks if t > ti] + [max_len])
            k = bp.plan_block(min(next_stop - ti, cfg.mem_every, max_len - ti))
            block = [fetch(iters, ti + i) for i in range(k)]
            frames = [np.stack([block[i][vi]["rgb"] if block[i][vi]
                                is not None else last[vi]
                                for i in range(k)]) for vi in active]
            probs = bp.step_block(frames, end=(ti + k == max_len))
            for i in range(k):
                for bi, vi in enumerate(active):
                    d = block[i][vi]
                    if d is None:
                        continue  # replayed past this video's end; discard
                    n += 1
                    no = cores[vi].object_manager.num_obj
                    save(vi, d, probs[bi][i][:no + 1])
            ti += k
        if attached:
            bp.detach()
    return n


def main():
    parser = ArgumentParser()
    parser.add_argument("--d16_path", default="../DAVIS/2016")
    parser.add_argument("--d17_path", default="../DAVIS/2017")
    parser.add_argument("--y18_path", default="../YouTube2018")
    parser.add_argument("--y19_path", default="../YouTube")
    parser.add_argument("--generic_path", default="./example/vos")
    parser.add_argument("--dataset", help="D16/D17/Y18/Y19/G", default="D17")
    parser.add_argument("--split", help="val/test", default="val")
    parser.add_argument("--use_all_masks", action="store_true")
    parser.add_argument("--batch", type=int, default=4,
                        help="videos per lockstep group")
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import reject_obj_sharding
    reject_obj_sharding(args, 'eval_vos_batched')
    args.dataset = args.dataset.upper()
    assert args.output is not None, "--output is required"

    is_youtube = args.dataset.startswith("Y")
    out_path = path.join(args.output, "Annotations") if is_youtube \
        else args.output

    if is_youtube:
        yv_path = args.y18_path if args.dataset == "Y18" else args.y19_path
        split = "valid" if args.split == "val" else args.split
        meta_dataset = YouTubeVOSTestDataset(yv_path, split=split,
                                             size=args.size)
    elif args.dataset == "D16":
        meta_dataset = DAVISTestDataset(
            args.d16_path, imset="../../2017/trainval/ImageSets/2016/val.txt",
            size=args.size)
    elif args.dataset == "D17":
        meta_dataset = DAVISTestDataset(path.join(args.d17_path, "trainval"),
                                        imset="2017/val.txt", size=args.size)
    elif args.dataset == "G":
        meta_dataset = GeneralVOSTestDataset(
            args.generic_path, size=args.size,
            use_all_masks=args.use_all_masks)
        if not args.save_all:
            args.save_all = True
            print("save_all is forced to be true in generic mode.")
    else:
        raise NotImplementedError(args.dataset)

    # pass 1: probe each video's mask schedule (file existence, no decode)
    # to build lockstep group keys
    groups = {}
    mid_groups = {}
    sequential = []
    readers = list(meta_dataset.get_datasets())
    for r in readers:
        mask_tis = r.mask_frame_indices()
        if not mask_tis:
            sequential.append(r)  # no reachable mask: nothing to propagate
            continue
        d0 = r[0]
        mask0 = d0.get("mask")
        if mask0 is not None and mask_tis == [0]:
            count_usage = (base_cfg.enable_long_term and (
                len(r) / (base_cfg.max_mid_term_frames -
                          base_cfg.min_mid_term_frames) *
                base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
            n_obj = len(d0["valid_labels"])
            key = (tuple(np.asarray(d0["rgb"]).shape),
                   base_cfg.pad_objects(n_obj), count_usage)
            groups.setdefault(key, []).append(r)
            continue
        # mid-stream mask arrivals (YouTubeVOS-style): the multi-bucket
        # masked-write path hosts them, long-term memory included
        count_usage = (base_cfg.enable_long_term and (
            len(r) / (base_cfg.max_mid_term_frames -
                      base_cfg.min_mid_term_frames) *
            base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
        mid_groups.setdefault(
            (tuple(np.asarray(d0["rgb"]).shape), count_usage), []).append(r)

    start_profile(args.profile)
    total_frames = 0
    t0 = time.perf_counter()
    for (shape, o_bucket, count_usage), rs in sorted(groups.items(),
                                                     key=str):
        cfg = dataclasses.replace(base_cfg,
                                  enable_long_term_count_usage=count_usage)
        for i in range(0, len(rs), args.batch):
            chunk = rs[i:i + args.batch]
            names = [r.vid_name for r in chunk]
            print(f"group {shape} x{o_bucket}obj: {names}")
            with video_fault_barrier(", ".join(names), args.raise_on_error):
                total_frames += run_group(model, variables, cfg, chunk,
                                          out_path, args.save_all)
    for (shape, count_usage), rs in sorted(mid_groups.items(), key=str):
        mid_cfg = dataclasses.replace(
            base_cfg, enable_long_term_count_usage=count_usage)
        for i in range(0, len(rs), args.batch):
            chunk = rs[i:i + args.batch]
            if len(chunk) == 1:
                sequential.append(chunk[0])
                continue
            names = [r.vid_name for r in chunk]
            print(f"mid-stream group {shape}: {names}")
            with video_fault_barrier(", ".join(names), args.raise_on_error):
                total_frames += run_group_midstream(
                    model, variables, mid_cfg, chunk, out_path,
                    args.save_all)
    for r in sequential:
        count_usage = (base_cfg.enable_long_term and (
            len(r) / (base_cfg.max_mid_term_frames -
                      base_cfg.min_mid_term_frames) *
            base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
        cfg = dataclasses.replace(base_cfg,
                                  enable_long_term_count_usage=count_usage)
        print(f"sequential (mid-stream masks): {r.vid_name}")
        with video_fault_barrier(r.vid_name, args.raise_on_error):
            total_frames += run_sequential(model, variables, cfg, r,
                                           out_path, args.save_all)
    total_time = time.perf_counter() - t0

    stop_profile(args.profile)
    print(f"Total processing time: {total_time}")
    print(f"Total processed frames: {total_frames}")
    if total_time > 0:
        print(f"Aggregate FPS: {total_frames / total_time}")
    report_max_memory()

    if is_youtube:
        import shutil
        print("Making zip for YouTubeVOS...")
        shutil.make_archive(path.join(args.output,
                                      path.basename(args.output)),
                            "zip", args.output, "Annotations")


if __name__ == "__main__":
    main()
