"""Referring-DAVIS evaluation: score-weighted consensus over sampled frames
picks a keyframe, then bidirectional propagation (backward from the keyframe,
then forward).

Behavioral anchor: reference:evaluation/eval_ref_davis.py:18-167.
"""
from __future__ import annotations

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

from deva_tpu.data.referring_test_datasets import ReferringDAVISTestDataset
from deva_tpu.data.transforms import resize_prob_to
from deva_tpu.inference.consensus import \
    find_consensus_with_established_association
from deva_tpu.inference.core import InferenceCore
from deva_tpu.utils.prefetch import Prefetcher
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config,
                                          video_fault_barrier)
from deva_tpu.inference.feature_store import ImageFeatureStore
from deva_tpu.inference.result_saver import ResultSaver
from deva_tpu.utils.palette import davis_palette


def run_bidirectional(model, variables, base_cfg, *, meta_dataset, vid_name,
                      keyframe_ti, projected_mask, time_indices, out_path,
                      image_feature_store, save_fn, reader_args=(),
                      obj_mesh=None):
    """Backward (keyframe -> 0, reversed) then forward propagation.
    reference:eval_ref_davis.py:89-155."""
    stats = {"time": 0.0, "frames": 0}
    backward = meta_dataset.get_partial_video_loader(
        vid_name, *reader_args, start=-1, end=keyframe_ti + 1, reverse=True)
    forward = meta_dataset.get_partial_video_loader(
        vid_name, *reader_args, start=keyframe_ti, end=-1, reverse=False)
    for vid_reader in (backward, forward):
        vid_length = len(vid_reader)
        count_usage = (base_cfg.enable_long_term and (
            vid_length / (base_cfg.max_mid_term_frames -
                          base_cfg.min_mid_term_frames) *
            base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
        cfg = dataclasses.replace(base_cfg,
                                  enable_long_term_count_usage=count_usage)
        processor = InferenceCore(model, variables, cfg,
                                  image_feature_store=image_feature_store,
                                  obj_mesh=obj_mesh)
        with Prefetcher(vid_reader) as prefetch:
            for ti, data in enumerate(prefetch):
                info = data["info"]
                image_ti = info["time_index"]
                mask = projected_mask if image_ti == keyframe_ti else None
                t0 = time.perf_counter()
                prob = processor.step(data["rgb"], mask,
                                      end=(ti == vid_length - 1),
                                      hard_mask=False,
                                      image_ti_override=image_ti,
                                      delete_buffer=False)
                prob = jax.block_until_ready(prob)
                stats["time"] += time.perf_counter() - t0
                stats["frames"] += 1
                save_fn(processor, np.asarray(prob), info)
    return stats


def main():
    parser = ArgumentParser()
    parser.add_argument("--img_path",
                        default="../DAVIS/2017/trainval/JPEGImages/480p")
    parser.add_argument("--mask_path")
    parser.add_argument("--num_voting_frames", type=int, default=5)
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import apply_obj_sharding
    obj_mesh, variables = apply_obj_sharding(args, variables)

    out_path = args.output
    meta_dataset = ReferringDAVISTestDataset(args.img_path, args.mask_path,
                                             size=args.size)
    total_time, total_frames = 0.0, 0

    for vid_name in meta_dataset.get_videos():
        with video_fault_barrier(vid_name, args.raise_on_error):
            video_scores = meta_dataset.get_scores(vid_name)
            store_core = InferenceCore(model, variables, base_cfg,
                                       obj_mesh=obj_mesh)
            image_feature_store = store_core.image_feature_store

            vid_reader = meta_dataset.get_offline_sampled_frames(
                vid_name, args.num_voting_frames)
            time_indices, images, masks, scores = [], [], [], []
            for ti in range(len(vid_reader)):
                data = vid_reader[ti]
                time_indices.append(data["info"]["time_index"])
                images.append(data["rgb"])
                masks.append(data["mask"])
                scores.append(video_scores[data["info"]["frame"][:-4]])

            t0 = time.perf_counter()
            keyframe_ti, projected_mask = \
                find_consensus_with_established_association(
                    time_indices, images, masks, store_core, scores=scores)
            total_time += time.perf_counter() - t0

            result_savers = []

            def save_fn(processor, prob, info):
                # one saver per processor (object manager differs between passes)
                if not result_savers or result_savers[-1][0] is not processor:
                    rs = ResultSaver(out_path, vid_name, dataset="ref_davis",
                                     palette=davis_palette(),
                                     object_manager=processor.object_manager)
                    result_savers.append((processor, rs))
                rs = result_savers[-1][1]
                rs.save_mask(prob, info["frame"],
                             need_resize=info["need_resize"],
                             shape=info["shape"])

            stats = run_bidirectional(
                model, variables, base_cfg, meta_dataset=meta_dataset,
                vid_name=vid_name, keyframe_ti=keyframe_ti,
                projected_mask=projected_mask, time_indices=time_indices,
                out_path=out_path, image_feature_store=image_feature_store,
                save_fn=save_fn, obj_mesh=obj_mesh)
            for _, rs in result_savers:
                rs.end()
            total_time += stats["time"]
            total_frames += stats["frames"]

            os.makedirs(path.join(out_path, vid_name), exist_ok=True)
            with open(path.join(out_path, vid_name, "key.txt"), "w") as f:
                f.write(f"options: {time_indices}; keyframe: {keyframe_ti}")
            print(f"{vid_name}: keyframe {keyframe_ti}")

    print(f"Total processing time: {total_time}")
    print(f"Total processed frames: {total_frames}")
    if total_time > 0:
        print(f"FPS: {total_frames / total_time}")


if __name__ == "__main__":
    main()
