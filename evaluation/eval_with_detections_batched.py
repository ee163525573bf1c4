"""Batched detection-driven evaluation (semi-online): videos are grouped by
padded resolution and advanced in lockstep — the plain propagation frames
and the incorporate-detection forward predictions run as ONE vmapped launch
per frame across the group (deva_tpu/inference/batched_detection.py), while
consensus voting / ILP / match-and-merge stay per-video on the host, exactly
as in the sequential driver.

Behavioral anchor: reference:evaluation/eval_with_detections.py:205-265
(semi-online machine). Equivalence with sequential stepping is tested in
tests/test_batched_detection.py; this driver also falls back to the
sequential path for singleton groups. Long-term memory batches too (stacked
per-slot LT rings with lockstep consolidation in the propagator).

Lockstep covers the schedule-uniform prefix (all videos share
next_voting_frame until the shortest video's last vote); the remaining tail
frames run sequentially per video.

Usage (example clip):
  python evaluation/eval_with_detections_batched.py --dataset demo \
      --img_path /root/reference/example/vipseg/images \
      --mask_path /root/reference/example/vipseg/source \
      --output /tmp/vipseg_out --model '' --disable_long_term --batch 4
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from argparse import ArgumentParser
from collections import defaultdict
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

from deva_tpu.data.vps_test_datasets import VIPSegDetectionTestDataset
from deva_tpu.inference.batched_detection import BatchedDetectionPropagator
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config,
                                          report_max_memory,
                                          video_fault_barrier)
from deva_tpu.inference.frame_utils import FrameInfo
from deva_tpu.inference.object_utils import convert_json_dict_to_objects_info
from deva_tpu.inference.result_saver import ResultSaver


def _frame_record(vid_reader, ti, dataset_name, save_all=False):
    data = vid_reader[ti]
    info = data["info"]
    if save_all:
        info["save"] = True
    segments_info = convert_json_dict_to_objects_info(
        data.get("mask"), _load_json(info), dataset=dataset_name)
    return data, info, segments_info


def _load_json(info):
    jp = info.get("json")
    if jp is None:
        return info.get("segments_info")
    with open(jp) as f:
        return json.load(f)


class _VideoState:
    def __init__(self, vid_reader, core, saver):
        self.reader = vid_reader
        self.core = core
        self.saver = saver
        self.length = len(vid_reader)


def run_sequential_tail(vs: _VideoState, args, dataset_name, ti0: int,
                        next_voting_frame: int):
    """Finish a video with the standard per-video semi-online machine from
    frame ti0 (reference:eval_with_detections.py:205-265)."""
    processor = vs.core
    vid_length = vs.length
    for ti in range(ti0, vid_length):
        data = vs.reader[ti]
        info = data["info"]
        image, mask = data["rgb"], data.get("mask")
        segments_info = convert_json_dict_to_objects_info(
            mask, _load_json(info), dataset=dataset_name)
        frame_info = FrameInfo(image, np.asarray(mask), segments_info, ti,
                               info)
        if ti + args.num_voting_frames > next_voting_frame:
            processor.add_to_temporary_buffer(frame_info)
            if ti == next_voting_frame:
                buf0 = processor.frame_buffer[0]
                _, consensus_mask, consensus_info = \
                    processor.vote_in_temporary_buffer(
                        keyframe_selection="first")
                prob = processor.incorporate_detection(
                    buf0.image, consensus_mask, consensus_info)
                next_voting_frame += args.detection_every
                if next_voting_frame >= vid_length:
                    next_voting_frame = vid_length + args.num_voting_frames
                if buf0.save_needed:
                    vs.saver.save_mask(prob, buf0.name,
                                       need_resize=buf0.info["need_resize"],
                                       shape=buf0.shape,
                                       path_to_image=buf0.path_to_image)
                for fi in processor.frame_buffer[1:]:
                    prob = processor.step(fi.image, None, None,
                                          end=(fi.ti == vid_length - 1))
                    if fi.save_needed:
                        vs.saver.save_mask(prob, fi.name,
                                           need_resize=fi.info["need_resize"],
                                           shape=fi.shape,
                                           path_to_image=fi.path_to_image)
                processor.clear_buffer()
        else:
            prob = processor.step(image, None, None,
                                  end=(ti == vid_length - 1))
            if info["save"]:
                vs.saver.save_mask(prob, info["frame"],
                                   need_resize=info["need_resize"],
                                   shape=info["shape"],
                                   path_to_image=info.get("path_to_image"))
    return next_voting_frame


def run_group(model, variables, cfg, group, args, dataset_name) -> int:
    """Lockstep the schedule-uniform prefix of a same-resolution group, then
    finish the tails sequentially. Returns total processed frames."""
    states = group
    cores = [vs.core for vs in states]
    min_len = min(vs.length for vs in states)
    bp = BatchedDetectionPropagator(model, variables, cfg)

    n_frames = 0
    next_voting = args.num_voting_frames - 1
    attached = False
    ti = 0
    while ti < min_len:
        if next_voting + args.detection_every >= min_len and \
                ti > next_voting:
            break  # schedules diverge after the last common vote
        records = [_frame_record(vs.reader, ti, dataset_name)
                   for vs in states]
        n_frames += len(states)
        if ti + args.num_voting_frames > next_voting:
            for vs, (data, info, segs) in zip(states, records):
                vs.core.add_to_temporary_buffer(FrameInfo(
                    data["rgb"], np.asarray(data.get("mask")), segs, ti,
                    info))
            if ti == next_voting:
                # batched forward prediction for every core in ONE launch,
                # BEFORE detaching so its sensory update (the reference's
                # internal _segment updates sensory too) reaches the cores
                buf0s = [vs.core.frame_buffer[0] for vs in states]
                fwd = None
                if attached:
                    fwd = bp.forward_probs([b.image for b in buf0s])
                    bp.detach()
                    attached = False
                for vi, vs in enumerate(states):
                    buf0 = buf0s[vi]
                    _, consensus_mask, consensus_info = \
                        vs.core.vote_in_temporary_buffer(
                            keyframe_selection="first")
                    fm = None
                    if fwd is not None:
                        n = vs.core.object_manager.num_obj
                        fm = np.argmax(fwd[vi][:n + 1], axis=0)
                    prob = vs.core.incorporate_detection(
                        buf0.image, consensus_mask, consensus_info,
                        forward_mask=fm)
                    if buf0.save_needed:
                        vs.saver.save_mask(
                            prob, buf0.name,
                            need_resize=buf0.info["need_resize"],
                            shape=buf0.shape,
                            path_to_image=buf0.path_to_image)
                next_voting += args.detection_every
                # batched propagation of the rest of the buffer
                bp.attach(cores)
                attached = True
                for j in range(1, len(states[0].core.frame_buffer)):
                    frames = [vs.core.frame_buffer[j].image for vs in states]
                    probs = bp.step_all(frames)
                    for vi, vs in enumerate(states):
                        fi = vs.core.frame_buffer[j]
                        if fi.save_needed:
                            n = vs.core.object_manager.num_obj
                            vs.saver.save_mask(
                                probs[vi][:n + 1], fi.name,
                                need_resize=fi.info["need_resize"],
                                shape=fi.shape,
                                path_to_image=fi.path_to_image)
                for vs in states:
                    vs.core.clear_buffer()
        else:
            assert attached
            probs = bp.step_all([r[0]["rgb"] for r in records])
            for vi, (vs, (data, info, segs)) in enumerate(
                    zip(states, records)):
                if info["save"]:
                    n = vs.core.object_manager.num_obj
                    vs.saver.save_mask(probs[vi][:n + 1], info["frame"],
                                       need_resize=info["need_resize"],
                                       shape=info["shape"],
                                       path_to_image=info.get(
                                           "path_to_image"))
        ti += 1

    if attached:
        bp.detach()
    # sequential tails
    for vs in states:
        n_frames += vs.length - ti
        run_sequential_tail(vs, args, dataset_name, ti, next_voting)
    return n_frames


def main():
    np.random.seed(42)
    parser = ArgumentParser()
    parser.add_argument("--img_path", default="./example/vipseg")
    parser.add_argument("--mask_path")
    parser.add_argument("--detection_every", type=int, default=5)
    parser.add_argument("--num_voting_frames", type=int, default=3)
    parser.add_argument("--dataset", default="demo", help="vipseg/demo")
    parser.add_argument("--max_missed_detection_count", type=int, default=5)
    parser.add_argument("--max_num_objects", type=int, default=-1)
    parser.add_argument("--batch", type=int, default=4)
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    dataset_name = args.dataset.lower()
    assert dataset_name in ("vipseg", "demo")

    if path.exists(path.join(args.mask_path, "pan_pred")):
        args.mask_path = path.join(args.mask_path, "pan_pred")
    meta_dataset = VIPSegDetectionTestDataset(args.img_path, args.mask_path,
                                              args.size)
    base_cfg = dataclasses.replace(
        base_cfg,
        max_missed_detection_count=args.max_missed_detection_count,
        max_num_objects=args.max_num_objects,
        detection_every=args.detection_every,
        num_voting_frames=args.num_voting_frames)

    # group by padded resolution; LT-enabled configs stay sequential
    groups = defaultdict(list)
    total_frames = 0
    t0 = time.perf_counter()
    save_all = getattr(args, "save_all", False)
    for vid_reader in meta_dataset.get_datasets():
        d0 = vid_reader[0]
        shape = tuple(np.asarray(d0["rgb"]).shape[:2])
        groups[shape].append(vid_reader)

    for shape, readers in groups.items():
        while readers:
            chunk, readers = readers[:args.batch], readers[args.batch:]
            states = []
            for r in chunk:
                core = InferenceCore(model, variables, base_cfg)
                core.enabled_long_id()
                saver = ResultSaver(args.output, r.vid_name,
                                    dataset=dataset_name, palette=r.palette,
                                    object_manager=core.object_manager)
                states.append(_VideoState(r, core, saver))
            with video_fault_barrier(f"group {shape} x{len(chunk)}",
                                     reraise=args.raise_on_error):
                if len(states) == 1:
                    for vs in states:
                        total_frames += vs.length
                        run_sequential_tail(vs, args, dataset_name, 0,
                                            args.num_voting_frames - 1)
                else:
                    total_frames += run_group(model, variables, base_cfg,
                                              states, args, dataset_name)
            for vs in states:
                vs.saver.end()
    dt = time.perf_counter() - t0
    print(f"Total processing time: {dt}")
    print(f"Total processed frames: {total_frames}")
    if dt > 0:
        print(f"FPS: {total_frames / dt}")
    report_max_memory()


if __name__ == "__main__":
    main()
