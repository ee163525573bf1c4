"""Text-prompted open-vocabulary tracking over an image folder.

Behavioral anchor: reference:demo/demo_with_text.py. The detector stack is
Grounding DINO + SAM through `transformers` (local checkpoint dirs or model
ids via --GROUNDING_DINO_HF_PATH / --SAM_HF_PATH).

  python demo/demo_with_text.py --img_path ./frames --prompt "person.dog" \
      --output ./out --model saves/DEVA-propagation.pth
"""
import json
import os
import sys
from argparse import ArgumentParser
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import dataclasses

from deva_tpu.data.simple_video_reader import SimpleVideoReader
from deva_tpu.ext.detectors import build_text_detector
from deva_tpu.ext.ext_eval_args import add_ext_eval_args, add_text_default_args
from deva_tpu.ext.with_text_processor import process_frame_with_text
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.demo_utils import flush_buffer
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config)
from deva_tpu.inference.result_saver import ResultSaver


def main():
    np.random.seed(42)
    parser = ArgumentParser()
    add_common_eval_args(parser)
    add_ext_eval_args(parser)
    add_text_default_args(parser)
    model, variables, cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import apply_obj_sharding
    obj_mesh, variables = apply_obj_sharding(args, variables)

    detector = build_text_detector(args)
    ext_cfg = vars(args)

    video_reader = SimpleVideoReader(args.img_path)
    out_path = args.output
    vid_length = len(video_reader)
    count_usage = (cfg.enable_long_term and (
        vid_length / (cfg.max_mid_term_frames - cfg.min_mid_term_frames) *
        cfg.num_prototypes) >= cfg.max_long_term_elements)
    cfg = dataclasses.replace(
        cfg, enable_long_term_count_usage=count_usage,
        detection_every=args.detection_every,
        num_voting_frames=args.num_voting_frames,
        max_missed_detection_count=args.max_missed_detection_count,
        max_num_objects=args.max_num_objects)

    deva = InferenceCore(model, variables, cfg, obj_mesh=obj_mesh)
    deva.enabled_long_id()
    result_saver = ResultSaver(out_path, None, dataset="demo",
                               object_manager=deva.object_manager)

    for ti in range(vid_length):
        frame, _, im_path = video_reader[ti]
        process_frame_with_text(deva, detector, ext_cfg, im_path,
                                result_saver, ti, image_np=frame)
    flush_buffer(deva, result_saver,
                 prompts=[p for p in args.prompt.split(".") if p.strip()])
    result_saver.end()

    with open(path.join(out_path, "pred.json"), "w") as f:
        json.dump(result_saver.video_json, f, indent=4)


if __name__ == "__main__":
    main()
