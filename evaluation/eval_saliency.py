"""Unsupervised DAVIS16 saliency evaluation: score-less consensus picks a
high-foreground keyframe; bidirectional propagation; binary PNG output.

Behavioral anchor: reference:evaluation/eval_saliency.py.
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

from deva_tpu.data.saliency_test_datasets import DAVISSaliencyTestDataset
from deva_tpu.data.transforms import resize_prob_to
from deva_tpu.inference.consensus import \
    find_consensus_with_established_association
from deva_tpu.inference.core import InferenceCore
from deva_tpu.utils.prefetch import Prefetcher
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config,
                                          video_fault_barrier)


def main():
    parser = ArgumentParser()
    parser.add_argument("--img_path", default="../DAVIS/2016/JPEGImages/480p")
    parser.add_argument("--mask_path")
    parser.add_argument("--imset", default=None)
    parser.add_argument("--num_voting_frames", type=int, default=10)
    add_common_eval_args(parser)
    model, variables, base_cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import apply_obj_sharding
    obj_mesh, variables = apply_obj_sharding(args, variables)

    out_path = args.output
    meta_dataset = DAVISSaliencyTestDataset(args.img_path, args.mask_path,
                                            imset=args.imset, size=args.size)
    total_time, total_frames = 0.0, 0

    for vid_name in meta_dataset.get_videos():
        with video_fault_barrier(vid_name, args.raise_on_error):
            shared_core = InferenceCore(model, variables, base_cfg,
                                        obj_mesh=obj_mesh)
            image_feature_store = shared_core.image_feature_store

            vid_reader = meta_dataset.get_offline_sampled_frames(
                vid_name, args.num_voting_frames)
            time_indices, images, masks = [], [], []
            for ti in range(len(vid_reader)):
                data = vid_reader[ti]
                time_indices.append(data["info"]["time_index"])
                images.append(data["rgb"])
                masks.append(data["mask"])

            t0 = time.perf_counter()
            keyframe_ti, projected_mask = \
                find_consensus_with_established_association(
                    time_indices, images, masks, shared_core, scores=None)
            total_time += time.perf_counter() - t0

            for reader in (
                    meta_dataset.get_partial_video_loader(
                        vid_name, start=-1, end=keyframe_ti + 1, reverse=True),
                    meta_dataset.get_partial_video_loader(
                        vid_name, start=keyframe_ti, end=-1, reverse=False)):
                vid_length = len(reader)
                count_usage = (base_cfg.enable_long_term and (
                    vid_length / (base_cfg.max_mid_term_frames -
                                  base_cfg.min_mid_term_frames) *
                    base_cfg.num_prototypes) >= base_cfg.max_long_term_elements)
                cfg = dataclasses.replace(
                    base_cfg, enable_long_term_count_usage=count_usage)
                processor = InferenceCore(model, variables, cfg,
                                          image_feature_store=image_feature_store,
                                          obj_mesh=obj_mesh)
                with Prefetcher(reader) as prefetch:
                    for ti, data in enumerate(prefetch):
                        info = data["info"]
                        image_ti = info["time_index"]
                        mask = projected_mask if image_ti == keyframe_ti \
                            else None
                        t0 = time.perf_counter()
                        prob = processor.step(data["rgb"], mask,
                                              end=(ti == vid_length - 1),
                                              hard_mask=False,
                                              image_ti_override=image_ti)
                        prob = np.asarray(jax.block_until_ready(prob))
                        total_time += time.perf_counter() - t0
                        total_frames += 1

                        if info["need_resize"]:
                            prob = resize_prob_to(prob, tuple(info["shape"]))
                        out_mask = (prob[1] > prob[0]).astype(np.uint8) * 255
                        d = path.join(out_path, vid_name)
                        os.makedirs(d, exist_ok=True)
                        Image.fromarray(out_mask).save(
                            path.join(d, info["frame"][:-4] + ".png"))

            with open(path.join(out_path, vid_name, "key.txt"), "w") as f:
                f.write(f"options: {time_indices}; keyframe: {keyframe_ti}")
            print(f"{vid_name}: keyframe {keyframe_ti}")

    print(f"Total processing time: {total_time}")
    print(f"Total processed frames: {total_frames}")
    if total_time > 0:
        print(f"FPS: {total_frames / total_time}")


if __name__ == "__main__":
    main()
