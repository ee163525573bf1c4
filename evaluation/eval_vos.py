"""Semi-supervised VOS evaluation driver (D16/D17/Y18/Y19/generic).

Behavioral anchor: reference:evaluation/eval_vos.py:23-234 — same CLI, same
output layout (palette PNG masks, YouTubeVOS/DAVIS zips, FPS report). The
per-frame device work is timed with block_until_ready around the step; output
saving happens on a background thread pool via numpy.

Usage (smoke clip):
  python evaluation/eval_vos.py --dataset G --generic_path \
      /root/reference/example/vos --output /tmp/out --model ''
"""
from __future__ import annotations

import os
import shutil
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
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.result_saver import device_argmax_ids
from deva_tpu.utils.prefetch import Prefetcher
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config,
                                          report_max_memory, start_profile,
                                          stop_profile, video_fault_barrier)

import dataclasses


def _emit(ti, data, prob, args, processor, vid_reader, vid_name, out_path,
          vid_length):
    """Per-frame output handling: resize / argmax / palette PNG /
    save_scores — identical for per-frame and block-stepped paths."""
    info = data["info"]
    frame = info["frame"]
    shape = info["shape"]
    need_resize = info["need_resize"]

    if need_resize or args.flip or args.save_scores:
        prob = np.asarray(prob)
        if need_resize:
            prob = resize_prob_to(prob, tuple(shape))
        if args.flip:
            prob = prob[..., ::-1]
        out_mask = np.argmax(prob, axis=0)
    else:
        # device fast path: pull argmax ids, not f32 probs
        out_mask = device_argmax_ids(prob)
    out_mask = processor.object_manager.tmp_cls_to_obj_cls(out_mask)

    if args.save_all or info["save"]:
        this_out_path = path.join(out_path, vid_name)
        os.makedirs(this_out_path, exist_ok=True)
        out_img = Image.fromarray(out_mask.astype(np.uint8))
        if vid_reader.get_palette() is not None:
            out_img.putpalette(vid_reader.get_palette())
        out_img.save(path.join(this_out_path, frame[:-4] + ".png"))

    if args.save_scores:
        np_path = path.join(args.output, "Scores", vid_name)
        os.makedirs(np_path, exist_ok=True)
        if ti == vid_length - 1:
            np.save(path.join(np_path, "backward.npy"),
                    {o.id: t for t, o in
                     processor.object_manager.tmp_id_to_obj.items()},
                    allow_pickle=True)
        if args.save_all or info["save"]:
            np.save(path.join(np_path, f"{frame[:-4]}.npy"),
                    (prob * 255).astype(np.uint8))


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
    parser.add_argument("--save_scores", action="store_true")
    parser.add_argument("--flip", action="store_true")
    parser.add_argument("--chunk", type=int, default=1,
                        help="process maskless stretches in blocks of up to "
                        "N frames via InferenceCore.step_chunk — one "
                        "compiled launch per memory period instead of one "
                        "per frame (see docs/PERFORMANCE.md). 1 = "
                        "per-frame stepping, the reference's loop shape.")
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import apply_obj_sharding
    obj_mesh, variables = apply_obj_sharding(args, variables)
    args.dataset = args.dataset.upper()

    if args.output is None:
        args.output = f"../output/{args.dataset}_{args.split}"
        print(f"Output path not provided. Defaulting to {args.output}")

    is_youtube = args.dataset.startswith("Y")
    is_davis = args.dataset.startswith("D")
    out_path = path.join(args.output, "Annotations") if \
        (is_youtube or args.save_scores) else args.output

    if is_youtube:
        yv_path = args.y18_path if args.dataset == "Y18" else args.y19_path
        split = "valid" if args.split == "val" else args.split
        meta_dataset = YouTubeVOSTestDataset(yv_path, split=split,
                                             size=args.size)
    elif is_davis:
        if args.dataset == "D16":
            meta_dataset = DAVISTestDataset(
                args.d16_path,
                imset="../../2017/trainval/ImageSets/2016/val.txt",
                size=args.size)
        else:
            if args.split == "val":
                meta_dataset = DAVISTestDataset(
                    path.join(args.d17_path, "trainval"),
                    imset="2017/val.txt", size=args.size)
            else:
                meta_dataset = DAVISTestDataset(
                    path.join(args.d17_path, "test-dev"),
                    imset="2017/test-dev.txt", size=args.size)
    elif args.dataset == "G":
        meta_dataset = GeneralVOSTestDataset(args.generic_path,
                                             size=args.size,
                                             use_all_masks=args.use_all_masks)
        if not args.save_all:
            args.save_all = True
            print("save_all is forced to be true in generic mode.")
    else:
        raise NotImplementedError(args.dataset)

    total_process_time = 0.0
    total_frames = 0
    start_profile(args.profile)

    for vid_reader in meta_dataset.get_datasets():
        vid_name = vid_reader.vid_name
        vid_length = len(vid_reader)
        # only count long-term usage when the video is long enough to fill it
        # (reference:evaluation/eval_vos.py:127-130)
        count_usage = (base_cfg.enable_long_term and (
            vid_length / (base_cfg.max_mid_term_frames -
                          base_cfg.min_mid_term_frames) *
            base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
        cfg = dataclasses.replace(base_cfg,
                                  enable_long_term_count_usage=count_usage)

        processor = InferenceCore(model, variables, cfg,
                                  obj_mesh=obj_mesh)
        first_mask_loaded = False
        print(f"{vid_name} ({vid_length} frames)")

        with video_fault_barrier(vid_name, args.raise_on_error), \
                Prefetcher(vid_reader) as prefetch:

            def handle_output(ti, data, prob):
                _emit(ti, data, prob, args, processor, vid_reader, vid_name,
                      out_path, vid_length)

            pending = []   # buffered (ti, data) runs for step_chunk

            def flush(end: bool):
                nonlocal total_process_time, total_frames
                if not pending:
                    return
                start = time.perf_counter()
                probs = processor.step_chunk(
                    [d["rgb"] for _, d in pending], end=end)
                probs[-1] = jax.block_until_ready(probs[-1])
                total_process_time += time.perf_counter() - start
                total_frames += len(pending)
                for (pti, pdata), p in zip(pending, probs):
                    handle_output(pti, pdata, p)
                pending.clear()

            for ti, data in enumerate(prefetch):
                image = data["rgb"]
                mask = data.get("mask")
                valid_labels = data.get("valid_labels")
                if valid_labels is not None:
                    valid_labels = [int(v) for v in valid_labels]

                if not first_mask_loaded:
                    if mask is not None:
                        first_mask_loaded = True
                    else:
                        continue

                if args.flip:
                    image = image[:, ::-1].copy()
                    data["rgb"] = image
                    mask = mask[..., ::-1].copy() if mask is not None else None

                if args.chunk > 1 and mask is None:
                    pending.append((ti, data))
                    if len(pending) >= args.chunk or ti == vid_length - 1:
                        flush(end=(ti == vid_length - 1))
                    continue
                flush(end=False)

                start = time.perf_counter()
                prob = processor.step(image, mask, valid_labels,
                                      end=(ti == vid_length - 1))
                prob = jax.block_until_ready(prob)
                total_process_time += time.perf_counter() - start
                total_frames += 1
                handle_output(ti, data, prob)
            # defensive: pending is normally drained inside the loop (the
            # ti == vid_length-1 flush); if vid_length metadata ever
            # overstates the frame count, the video IS over here, so the
            # stragglers must get the end-of-video step (sensory freeze)
            # like the per-frame path would
            flush(end=True)

    stop_profile(args.profile)
    print(f"Total processing time: {total_process_time}")
    print(f"Total processed frames: {total_frames}")
    if total_process_time > 0:
        print(f"FPS: {total_frames / total_process_time}")
    report_max_memory()

    if not args.save_scores:
        if is_youtube:
            print("Making zip for YouTubeVOS...")
            shutil.make_archive(path.join(args.output,
                                          path.basename(args.output)),
                                "zip", args.output, "Annotations")
        elif is_davis and args.split == "test":
            print("Making zip for DAVIS test-dev...")
            shutil.make_archive(args.output, "zip", args.output)


if __name__ == "__main__":
    main()
