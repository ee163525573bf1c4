"""Detection-driven evaluation driver (vipseg/burst/unsup_davis17/demo) with
online and semi-online temporal settings.

Behavioral anchor: reference:evaluation/eval_with_detections.py:27-352 — same
CLI, same per-frame state machine (buffer until next_voting_frame, in-clip
consensus vote, incorporate_detection, propagate the rest), same output JSON
layout, auto-runs stuff-merge + VPQ/STQ for VIPSeg.

Smoke run (example clip):
  python evaluation/eval_with_detections.py --dataset demo \
      --img_path /root/reference/example/vipseg/images \
      --mask_path /root/reference/example/vipseg/source \
      --output /tmp/vipseg_out --model ''
"""
from __future__ import annotations

import json
import os
import sys
import time
from argparse import ArgumentParser
from functools import partial
from multiprocessing import Process
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import jax

from deva_tpu.data.vps_test_datasets import (BURSTDetectionTestDataset,
                                             VIPSegDetectionTestDataset)
from deva_tpu.inference.core import InferenceCore
from deva_tpu.utils.prefetch import Prefetcher
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config,
                                          report_max_memory, start_profile,
                                          stop_profile, video_fault_barrier)
from deva_tpu.inference.frame_utils import FrameInfo
from deva_tpu.inference.object_utils import convert_json_dict_to_objects_info
from deva_tpu.inference.result_saver import ResultSaver
from deva_tpu.inference.postprocess_unsup_davis17 import limit_max_id

import dataclasses


def main():
    np.random.seed(42)  # for id2rgb (reference:eval_with_detections.py:29)
    parser = ArgumentParser()
    parser.add_argument("--img_path", default="./example/vipseg")
    parser.add_argument("--mask_path")
    parser.add_argument("--json_path", default=None)
    parser.add_argument("--detection_every", type=int, default=5)
    parser.add_argument("--num_voting_frames", type=int, default=3)
    parser.add_argument("--dataset", default="vipseg",
                        help="vipseg/burst/unsup_davis17/demo")
    parser.add_argument("--max_missed_detection_count", type=int, default=5)
    parser.add_argument("--no_metrics", action="store_true")
    parser.add_argument("--temporal_setting", default="semionline",
                        help="semionline/online")
    parser.add_argument("--max_num_objects", type=int, default=-1)
    parser.add_argument("--start", type=int, default=None)
    parser.add_argument("--count", type=int, default=None)
    parser.add_argument("--burst_gt_json",
                        default="../BURST/val/all_classes.json")
    parser.add_argument("--vipseg_root", default="../VIPSeg/VIPSeg_720P")
    parser.add_argument("--postprocess_limit_max_id", type=int, default=20)
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import apply_obj_sharding
    obj_mesh, variables = apply_obj_sharding(args, variables)

    temporal_setting = args.temporal_setting.lower()
    assert temporal_setting in ("semionline", "online")
    dataset_name = args.dataset.lower()
    assert dataset_name in ("vipseg", "burst", "unsup_davis17", "demo")
    is_vipseg = dataset_name == "vipseg"
    is_burst = dataset_name == "burst"
    is_davis = dataset_name == "unsup_davis17"
    is_demo = dataset_name == "demo"

    if args.json_path is None and path.exists(
            path.join(args.mask_path, "pred.json")):
        args.json_path = path.join(args.mask_path, "pred.json")
    out_path = args.output
    if path.exists(path.join(args.mask_path, "pan_pred")):
        args.mask_path = path.join(args.mask_path, "pan_pred")

    if is_vipseg or is_davis or is_demo:
        meta_dataset = VIPSegDetectionTestDataset(args.img_path,
                                                  args.mask_path, args.size)
    elif is_burst:
        meta_dataset = BURSTDetectionTestDataset(
            args.img_path, args.mask_path, args.burst_gt_json, args.size,
            start=args.start, count=args.count)

    global_json_enabled = args.json_path is not None
    per_vid_json_enabled = None
    if global_json_enabled:
        print(f"Using a global json file {args.json_path}")
        with open(args.json_path) as f:
            all_json_info = json.load(f)["annotations"]
        video_id_to_annotation = {
            ann["video_id"]: ann["annotations"] for ann in all_json_info}

    output_json_annotations = []
    total_process_time = 0.0
    total_frames = 0
    start_profile(args.profile)

    base_cfg = dataclasses.replace(
        base_cfg,
        max_missed_detection_count=args.max_missed_detection_count,
        max_num_objects=args.max_num_objects,
        detection_every=args.detection_every,
        num_voting_frames=args.num_voting_frames)

    for vid_reader in meta_dataset.get_datasets():
        vid_name = vid_reader.vid_name
        vid_length = len(vid_reader)
        next_voting_frame = args.num_voting_frames - 1
        count_usage = (base_cfg.enable_long_term and (
            vid_length / (base_cfg.max_mid_term_frames -
                          base_cfg.min_mid_term_frames) *
            base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
        cfg = dataclasses.replace(base_cfg,
                                  enable_long_term_count_usage=count_usage)

        processor = InferenceCore(model, variables, cfg,
                                  obj_mesh=obj_mesh)
        result_saver = ResultSaver(out_path, vid_name, dataset=dataset_name,
                                   palette=vid_reader.palette,
                                   object_manager=processor.object_manager)
        print(f"{vid_name} ({vid_length} frames)")

        def timed(fn, *a, **kw):
            nonlocal total_process_time, total_frames
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            out = jax.block_until_ready(out)
            total_process_time += time.perf_counter() - t0
            total_frames += 1
            return np.asarray(out)

        barrier = video_fault_barrier(vid_name, args.raise_on_error)
        with barrier, Prefetcher(vid_reader) as prefetch:
            # background decode: frame ti+1 (image + detection PNG/JSON
            # paths) loads while the chip works on frame ti
            for ti, data in enumerate(prefetch):
                image = data["rgb"]
                mask = data.get("mask")
                info = data["info"]
                frame = info["frame"]
                shape = info["shape"]
                need_resize = info["need_resize"]
                path_to_image = info["path_to_image"]
                if args.save_all:
                    info["save"] = True
                if info["is_rgb"]:
                    processor.enabled_long_id()

                segments_info_json = None
                if not global_json_enabled:
                    json_path = info.get("json")
                    if per_vid_json_enabled is None:
                        per_vid_json_enabled = json_path is not None
                        print("Using per-video json."
                              if per_vid_json_enabled else
                              "Neither global nor per-video json exist.")
                    elif json_path is None and per_vid_json_enabled:
                        raise RuntimeError(
                            f"Per-video json not found for {vid_name}.")
                    if per_vid_json_enabled:
                        with open(json_path) as f:
                            segments_info_json = json.load(f)
                        processor.enabled_long_id()
                else:
                    segments_info_json = \
                        video_id_to_annotation[vid_name][ti]["segments_info"]
                    processor.enabled_long_id()

                segments_info = convert_json_dict_to_objects_info(
                    mask, segments_info_json, dataset=dataset_name)
                frame_info = FrameInfo(image, mask, segments_info, ti, info)

                if temporal_setting == "semionline":
                    if ti + args.num_voting_frames > next_voting_frame:
                        processor.add_to_temporary_buffer(frame_info)
                        if ti == next_voting_frame:
                            buf0 = processor.frame_buffer[0]

                            def vote_and_incorporate():
                                _, consensus_mask, new_segments_info = \
                                    processor.vote_in_temporary_buffer(
                                        keyframe_selection="first")
                                return processor.incorporate_detection(
                                    buf0.image, consensus_mask, new_segments_info)

                            prob = timed(vote_and_incorporate)
                            next_voting_frame += args.detection_every
                            if next_voting_frame >= vid_length:
                                next_voting_frame = (vid_length +
                                                     args.num_voting_frames)
                            if buf0.save_needed:
                                result_saver.save_mask(
                                    prob, buf0.name, need_resize=need_resize,
                                    shape=buf0.shape,
                                    path_to_image=buf0.path_to_image)

                            for fi in processor.frame_buffer[1:]:
                                prob = timed(processor.step, fi.image, None, None,
                                             end=(fi.ti == vid_length - 1))
                                if fi.save_needed:
                                    result_saver.save_mask(
                                        prob, fi.name, need_resize=need_resize,
                                        shape=fi.shape,
                                        path_to_image=fi.path_to_image)
                            processor.clear_buffer()
                    else:
                        prob = timed(processor.step, image, None, None,
                                     end=(ti == vid_length - 1))
                        if info["save"]:
                            result_saver.save_mask(prob, frame,
                                                   need_resize=need_resize,
                                                   shape=shape,
                                                   path_to_image=path_to_image)
                else:  # online
                    if ti % args.detection_every == 0:
                        assert mask is not None
                        prob = timed(processor.incorporate_detection, image, mask,
                                     segments_info)
                    else:
                        prob = timed(processor.step, image, None, None,
                                     end=(ti == vid_length - 1))
                    if info["save"]:
                        result_saver.save_mask(prob, frame,
                                               need_resize=need_resize,
                                               shape=shape,
                                               path_to_image=path_to_image)

        result_saver.end()
        if barrier.failed:
            continue
        if is_vipseg:
            output_json_annotations.append(result_saver.video_json)
        elif is_burst:
            os.makedirs(path.join(out_path, vid_name), exist_ok=True)
            with open(path.join(out_path, vid_name, "pred.json"), "w") as f:
                json.dump(result_saver.video_json, f)
        elif is_demo:
            os.makedirs(path.join(out_path, "JSONFiles"), exist_ok=True)
            with open(path.join(out_path, "JSONFiles",
                                f"{vid_name}.json"), "w") as f:
                json.dump(result_saver.video_json, f, indent=4)

    if is_vipseg:
        with open(path.join(out_path, "pred.json"), "w") as f:
            json.dump({"annotations": output_json_annotations}, f)

    stop_profile(args.profile)
    print(f"Total processing time: {total_process_time}")
    print(f"Total processed frames: {total_frames}")
    if total_process_time > 0:
        print(f"FPS: {total_frames / total_process_time}")
    report_max_memory()

    if is_vipseg:
        from deva_tpu.metrics.stuff_merging import merge_stuff
        print("Starting evaluation...")
        merge_stuff(out_path, out_path)
        if not args.no_metrics:
            from deva_tpu.metrics.eval_stq_vipseg import eval_stq
            from deva_tpu.metrics.eval_vpq_vipseg import eval_vpq
            vipseg_root = args.vipseg_root
            p1 = Process(target=partial(
                eval_stq, out_path, f"{vipseg_root}/panomasksRGB",
                f"{vipseg_root}/panoptic_gt_VIPSeg_val.json"))
            p1.start()
            eval_vpq(out_path, f"{vipseg_root}/panomasksRGB",
                     f"{vipseg_root}/panoptic_gt_VIPSeg_val.json",
                     num_processes=16)
            p1.join()
    elif is_davis and args.postprocess_limit_max_id > 0:
        print("Post-processing DAVIS 2017...")
        limit_max_id(out_path, out_path,
                     max_num_objects=args.postprocess_limit_max_id)


if __name__ == "__main__":
    main()
