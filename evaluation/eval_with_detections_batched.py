"""Batched detection-driven evaluation (semi-online AND online): videos are
grouped by padded resolution (+ LT usage-counting policy) and advanced in
lockstep — plain propagation spans run as K-frame block launches (lax.scan
read frames + one write frame) and the incorporate-detection forward
predictions run as ONE vmapped launch across the group
(deva_tpu/inference/batched_detection.py), while consensus voting / ILP /
match-and-merge stay per-video on the host, exactly as in the sequential
driver.

Behavioral anchors: reference:evaluation/eval_with_detections.py:205-265
(semi-online machine) and :225-237 (online machine). Equivalence with
sequential stepping is tested in tests/test_batched_detection.py and at the
driver level in tests/test_batched_detection_driver.py (both settings);
singleton groups fall back to the sequential path. Long-term memory batches
too (stacked per-slot LT rings with lockstep consolidation in the
propagator). For --dataset vipseg the same post-pipeline as the sequential
driver runs (pred.json, stuff merge, VPQ/STQ).

Semi-online lockstep covers the schedule-uniform prefix (all videos share
next_voting_frame until the shortest video's last vote); online lockstep
covers the whole common prefix (the cadence ti % detection_every == 0 never
diverges). Remaining tail frames run sequentially per video.

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


def run_sequential_tail_online(vs: _VideoState, args, dataset_name,
                               ti0: int):
    """Finish a video with the per-video ONLINE machine from frame ti0
    (reference:eval_with_detections.py:225-237: incorporate every
    detection_every-th frame, plain step otherwise)."""
    processor = vs.core
    vid_length = vs.length
    for ti in range(ti0, vid_length):
        data, info, segments_info = _frame_record(vs.reader, ti,
                                                  dataset_name)
        image, mask = data["rgb"], data.get("mask")
        if ti % args.detection_every == 0:
            assert mask is not None
            prob = processor.incorporate_detection(image, mask,
                                                   segments_info)
        else:
            prob = processor.step(image, None, None,
                                  end=(ti == vid_length - 1))
        if info["save"]:
            vs.saver.save_mask(prob, info["frame"],
                               need_resize=info["need_resize"],
                               shape=info["shape"],
                               path_to_image=info.get("path_to_image"))


def _any_engaged(cores) -> bool:
    return any(c.memory is not None and c.memory.engaged for c in cores)


def _step_group_per_core(states, ti, k, dataset_name) -> None:
    """All-empty-group fallback: NO video in the group has any objects yet
    (every consensus so far came up empty), so there is no stacked state to
    attach — step each core individually. core.step without memory returns
    background and advances the frame clock, the reference's own no-object
    behavior (reference:deva/inference/inference_core.py:57-59,211-215)."""
    for i in range(k):
        for vs in states:
            data, info, _ = _frame_record(vs.reader, ti + i, dataset_name)
            prob = vs.core.step(data["rgb"])
            if info["save"]:
                n = vs.core.object_manager.num_obj
                vs.saver.save_mask(np.asarray(prob)[:n + 1], info["frame"],
                                   need_resize=info["need_resize"],
                                   shape=info["shape"],
                                   path_to_image=info.get("path_to_image"))


def run_group_online(model, variables, cfg, group, args,
                     dataset_name) -> int:
    """ONLINE lockstep: the detection cadence (ti % detection_every == 0)
    is global, so schedules never diverge — the whole common prefix
    (min video length) runs lockstep. Detection frames run the batched
    forward prediction (ONE launch) + per-video incorporate_detection on
    the host; the plain spans between detections run as K-frame block
    launches. Tails past min_len finish with the per-video online machine.
    Behavioral anchor: reference:evaluation/eval_with_detections.py:225-237.
    """
    states = group
    cores = [vs.core for vs in states]
    min_len = min(vs.length for vs in states)
    bp = BatchedDetectionPropagator(model, variables, cfg)

    n_frames = 0
    attached = False
    ti = 0
    while ti < min_len:
        if ti % args.detection_every == 0:
            records = [_frame_record(vs.reader, ti, dataset_name)
                       for vs in states]
            n_frames += len(states)
            fwd_ids = None
            if attached:
                # the forward _segment every core's incorporate would run,
                # in ONE launch (sensory updates included), argmaxed to
                # uint8 ids on device — then detach so the per-video merge
                # runs reference-parity host code
                fwd_ids = bp.forward_ids([r[0]["rgb"] for r in records])
                bp.detach()
                attached = False
            for vi, vs in enumerate(states):
                data, info, segs = records[vi]
                mask = data.get("mask")
                assert mask is not None
                fm = fwd_ids[vi] if fwd_ids is not None else None
                prob = vs.core.incorporate_detection(
                    data["rgb"], mask, segs, forward_mask=fm)
                if info["save"]:
                    vs.saver.save_mask(
                        prob, info["frame"],
                        need_resize=info["need_resize"],
                        shape=info["shape"],
                        path_to_image=info.get("path_to_image"))
            if _any_engaged(cores):
                bp.attach(cores)
                attached = True
            ti += 1
        else:
            span = min(args.detection_every - ti % args.detection_every,
                       min_len - ti)
            if not attached:
                _step_group_per_core(states, ti, span, dataset_name)
                n_frames += len(states) * span
                ti += span
                continue
            k = bp.plan_block(min(span, cfg.mem_every))
            records_k = [[_frame_record(vs.reader, ti + i, dataset_name)
                          for vs in states] for i in range(k)]
            n_frames += len(states) * k
            frames = [np.stack([records_k[i][vi][0]["rgb"]
                                for i in range(k)])
                      for vi in range(len(states))]
            probs = bp.step_block(frames)
            for i in range(k):
                for vi, vs in enumerate(states):
                    info = records_k[i][vi][1]
                    if info["save"]:
                        n = vs.core.object_manager.num_obj
                        vs.saver.save_mask(
                            probs[vi][i][:n + 1], info["frame"],
                            need_resize=info["need_resize"],
                            shape=info["shape"],
                            path_to_image=info.get("path_to_image"))
            ti += k

    if attached:
        bp.detach()
    for vs in states:
        n_frames += vs.length - ti
        run_sequential_tail_online(vs, args, dataset_name, ti)
    return n_frames


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
        if not (ti + args.num_voting_frames > next_voting):
            # plain propagation span before buffering resumes: consume it
            # in K-frame block launches (scan read frames + write frame)
            span = min(next_voting - args.num_voting_frames + 1 - ti,
                       min_len - ti)
            if not attached:
                _step_group_per_core(states, ti, span, dataset_name)
                n_frames += len(states) * span
                ti += span
                continue
            k = bp.plan_block(min(span, cfg.mem_every))
            records_k = [[_frame_record(vs.reader, ti + i, dataset_name)
                          for vs in states] for i in range(k)]
            n_frames += len(states) * k
            frames = [np.stack([records_k[i][vi][0]["rgb"]
                                for i in range(k)])
                      for vi in range(len(states))]
            probs = bp.step_block(frames)
            for i in range(k):
                for vi, vs in enumerate(states):
                    info = records_k[i][vi][1]
                    if info["save"]:
                        n = vs.core.object_manager.num_obj
                        vs.saver.save_mask(
                            probs[vi][i][:n + 1], info["frame"],
                            need_resize=info["need_resize"],
                            shape=info["shape"],
                            path_to_image=info.get("path_to_image"))
            ti += k
            continue
        records = [_frame_record(vs.reader, ti, dataset_name)
                   for vs in states]
        n_frames += len(states)
        for vs, (data, info, segs) in zip(states, records):
            vs.core.add_to_temporary_buffer(FrameInfo(
                data["rgb"], np.asarray(data.get("mask")), segs, ti,
                info))
        if ti == next_voting:
            # batched forward prediction for every core in ONE launch,
            # BEFORE detaching so its sensory update (the reference's
            # internal _segment updates sensory too) reaches the cores
            buf0s = [vs.core.frame_buffer[0] for vs in states]
            fwd_ids = None
            if attached:
                # device-side masked argmax (uint8 ids) — the f32
                # probability stack is ~36x more tunnel traffic
                fwd_ids = bp.forward_ids([b.image for b in buf0s])
                bp.detach()
                attached = False
            # every (video, frame) spatial alignment in ONE launch with
            # id-sized readbacks (measured: the per-video alignment round
            # trips were 67% of detection-mode cycle time, bench.py
            # --detection phase breakdown)
            projs = bp.align_consensus_batched([vs.core for vs in states],
                                               keyframe_selection="first")
            # the per-video votes (joint-hist IoU + ILP on the precomputed
            # alignments) are independent host work: a thread pool overlaps
            # one video's ILP with another's (SURVEY §7 hard part 4)
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(min(4, len(states))) as pool:
                votes = list(pool.map(
                    lambda vp: vp[0].core.vote_in_temporary_buffer(
                        keyframe_selection="first", precomputed_proj=vp[1]),
                    zip(states, projs)))
            for vi, vs in enumerate(states):
                buf0 = buf0s[vi]
                _, consensus_mask, consensus_info = votes[vi]
                fm = fwd_ids[vi] if fwd_ids is not None else None
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
            if not _any_engaged(cores):
                # every consensus so far was empty: per-core buffer steps
                for vs in states:
                    for fi in vs.core.frame_buffer[1:]:
                        prob = vs.core.step(fi.image)
                        if fi.save_needed:
                            n = vs.core.object_manager.num_obj
                            vs.saver.save_mask(
                                np.asarray(prob)[:n + 1], fi.name,
                                need_resize=fi.info["need_resize"],
                                shape=fi.shape,
                                path_to_image=fi.path_to_image)
                for vs in states:
                    vs.core.clear_buffer()
                ti += 1
                continue
            bp.attach(cores)
            attached = True
            nbuf = len(states[0].core.frame_buffer)
            j = 1
            while j < nbuf:
                k = bp.plan_block(min(nbuf - j, cfg.mem_every))
                frames = [np.stack([np.asarray(
                    vs.core.frame_buffer[j + i].image)
                    for i in range(k)]) for vs in states]
                probs = bp.step_block(frames)
                for i in range(k):
                    for vi, vs in enumerate(states):
                        fi = vs.core.frame_buffer[j + i]
                        if fi.save_needed:
                            n = vs.core.object_manager.num_obj
                            vs.saver.save_mask(
                                probs[vi][i][:n + 1], fi.name,
                                need_resize=fi.info["need_resize"],
                                shape=fi.shape,
                                path_to_image=fi.path_to_image)
                j += k
            for vs in states:
                vs.core.clear_buffer()
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
    parser.add_argument("--temporal_setting", default="semionline",
                        help="semionline/online")
    parser.add_argument("--dataset", default="demo", help="vipseg/demo")
    parser.add_argument("--max_missed_detection_count", type=int, default=5)
    parser.add_argument("--max_num_objects", type=int, default=-1)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--no_metrics", action="store_true")
    parser.add_argument("--vipseg_root", default="../VIPSeg/VIPSeg_720P")
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import reject_obj_sharding
    reject_obj_sharding(args, 'eval_with_detections_batched')
    dataset_name = args.dataset.lower()
    assert dataset_name in ("vipseg", "demo")
    temporal_setting = args.temporal_setting.lower()
    assert temporal_setting in ("semionline", "online")

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

    is_vipseg = dataset_name == "vipseg"
    output_json_annotations = []
    groups = defaultdict(list)  # group by padded resolution
    total_frames = 0
    t0 = time.perf_counter()
    save_all = getattr(args, "save_all", False)
    for vid_reader in meta_dataset.get_datasets():
        d0 = vid_reader[0]
        shape = tuple(np.asarray(d0["rgb"]).shape[:2])
        # per-video LT usage-counting policy from video length, as in the
        # sequential driver (reference:evaluation/eval_vos.py:127-130) —
        # part of the lockstep grouping key so one compiled config serves
        # the whole group
        count_usage = (base_cfg.enable_long_term and (
            len(vid_reader) / (base_cfg.max_mid_term_frames -
                               base_cfg.min_mid_term_frames) *
            base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
        groups[(shape, count_usage)].append(vid_reader)

    for (shape, count_usage), readers in sorted(groups.items(), key=str):
        cfg = dataclasses.replace(base_cfg,
                                  enable_long_term_count_usage=count_usage)
        while readers:
            chunk, readers = readers[:args.batch], readers[args.batch:]
            states = []
            for r in chunk:
                core = InferenceCore(model, variables, cfg)
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
                        if temporal_setting == "online":
                            run_sequential_tail_online(vs, args,
                                                       dataset_name, 0)
                        else:
                            run_sequential_tail(vs, args, dataset_name, 0,
                                                args.num_voting_frames - 1)
                elif temporal_setting == "online":
                    total_frames += run_group_online(
                        model, variables, cfg, states, args, dataset_name)
                else:
                    total_frames += run_group(model, variables, cfg,
                                              states, args, dataset_name)
            for vs in states:
                vs.saver.end()
                if is_vipseg:
                    output_json_annotations.append(vs.saver.video_json)
    dt = time.perf_counter() - t0
    print(f"Total processing time: {dt}")
    print(f"Total processed frames: {total_frames}")
    if dt > 0:
        print(f"FPS: {total_frames / dt}")
    report_max_memory()

    if is_vipseg:
        # same post-pipeline as the sequential driver
        # (reference:evaluation/eval_with_detections.py:331-344)
        with open(path.join(args.output, "pred.json"), "w") as f:
            json.dump({"annotations": output_json_annotations}, f)
        from deva_tpu.metrics.stuff_merging import merge_stuff
        print("Starting evaluation...")
        merge_stuff(args.output, args.output)
        if not args.no_metrics:
            from functools import partial
            from multiprocessing import Process
            from deva_tpu.metrics.eval_stq_vipseg import eval_stq
            from deva_tpu.metrics.eval_vpq_vipseg import eval_vpq
            vipseg_root = args.vipseg_root
            p1 = Process(target=partial(
                eval_stq, args.output, f"{vipseg_root}/panomasksRGB",
                f"{vipseg_root}/panoptic_gt_VIPSeg_val.json"))
            p1.start()
            eval_vpq(args.output, f"{vipseg_root}/panomasksRGB",
                     f"{vipseg_root}/panoptic_gt_VIPSeg_val.json",
                     num_processes=16)
            p1.join()


if __name__ == "__main__":
    main()
