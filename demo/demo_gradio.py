"""Interactive demo app: text-prompted tracking over an uploaded video with a
streamed visualization (cv2 VideoCapture -> VideoWriter pipeline).

Behavioral anchor: reference:demo/demo_gradio.py:23-356. The gradio UI is
optional — without `gradio` installed this runs as a CLI over a video file
(the same decode->track->encode pipeline the gradio tab drives).

  python demo/demo_gradio.py --video input.mp4 --prompt "person.car" \
      --output ./out --model saves/DEVA-propagation.pth
"""
import json
import os
import sys
import tempfile
from argparse import ArgumentParser
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import dataclasses

import cv2

from deva_tpu.ext.detectors import build_text_detector
from deva_tpu.ext.ext_eval_args import add_ext_eval_args, add_text_default_args
from deva_tpu.ext.with_text_processor import process_frame_with_text
from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.demo_utils import flush_buffer
from deva_tpu.inference.eval_args import (add_common_eval_args,
                                          get_model_and_config)
from deva_tpu.inference.result_saver import ResultSaver


def track_video(model, variables, cfg, ext_cfg, detector, video_path: str,
                out_dir: str, max_frames: int = -1,
                process_fn=None, progress=None, obj_mesh=None) -> str:
    """Decode -> track -> encode with per-frame progress (the reference
    drives a tqdm over the estimated frame count,
    reference:demo/demo_gradio.py:60-85). Returns the output video path."""
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    n_total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    vid_length = n_total if max_frames <= 0 else min(n_total, max_frames)
    if progress is None:
        from tqdm import tqdm
        bar = tqdm(total=vid_length)
        tick = bar.update
    else:
        it = iter(progress.tqdm(range(vid_length)))
        tick = lambda _=1: next(it, None)

    count_usage = (cfg.enable_long_term and (
        vid_length / (cfg.max_mid_term_frames - cfg.min_mid_term_frames) *
        cfg.num_prototypes) >= cfg.max_long_term_elements)
    cfg = dataclasses.replace(cfg, enable_long_term_count_usage=count_usage)

    deva = InferenceCore(model, variables, cfg, obj_mesh=obj_mesh)
    deva.enabled_long_id()
    result_saver = ResultSaver(out_dir, None, dataset="gradio",
                               object_manager=deva.object_manager)
    os.makedirs(out_dir, exist_ok=True)
    out_video = path.join(out_dir, "tracked.mp4")
    writer = None

    ti = 0
    while ti < vid_length:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        if writer is None:
            h, w = frame.shape[:2]
            writer = cv2.VideoWriter(out_video,
                                     cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                     (w, h))
            result_saver.writer = writer
        fn = process_fn or process_frame_with_text
        fn(deva, detector, ext_cfg, f"{ti:07d}.jpg", result_saver, ti,
           image_np=frame)
        ti += 1
        tick(1)
    prompt = ext_cfg.get("prompt")
    flush_buffer(deva, result_saver,
                 prompts=[p for p in prompt.split(".") if p.strip()]
                 if prompt else None)
    result_saver.end()
    cap.release()
    if writer is not None:
        writer.release()
    return out_video


def main():
    np.random.seed(42)
    parser = ArgumentParser()
    parser.add_argument("--video", help="input video file (CLI mode)")
    parser.add_argument("--max_frames", type=int, default=-1)
    parser.add_argument("--serve", action="store_true",
                        help="launch the gradio UI (requires gradio)")
    add_common_eval_args(parser)
    add_ext_eval_args(parser)
    add_text_default_args(parser)
    model, variables, cfg, args = get_model_and_config(parser)
    from deva_tpu.inference.eval_args import apply_obj_sharding
    obj_mesh, variables = apply_obj_sharding(args, variables)
    cfg = dataclasses.replace(
        cfg, detection_every=args.detection_every,
        num_voting_frames=args.num_voting_frames,
        max_missed_detection_count=args.max_missed_detection_count,
        max_num_objects=args.max_num_objects)
    ext_cfg = vars(args)
    detector = build_text_detector(args)

    if args.serve:
        try:
            import gradio as gr
        except ImportError:
            raise SystemExit("gradio is not installed; run in CLI mode with "
                             "--video instead")

        # Per-run knobs mirror the reference app
        # (reference:demo/demo_gradio.py:180-356): threshold, internal
        # resolution, detection cadence, missed-detection purge, temporal
        # setting, SAM variant — with the fully TPU-native MobileSAM /
        # Light-HQ-SAM as first-class variants next to the HF models.

        def _per_run_cfg(size, det_every, max_missed, temporal):
            c = dataclasses.replace(
                cfg, size=int(size), detection_every=int(det_every),
                max_missed_detection_count=int(max_missed),
                enable_long_term_count_usage=True)
            e = dict(ext_cfg, size=int(size),
                     detection_every=int(det_every),
                     temporal_setting=temporal)
            return c, e

        def run_text(video, prompt, threshold, size, det_every, max_missed,
                     temporal, max_frames, progress=gr.Progress()):
            c, e = _per_run_cfg(size, det_every, max_missed, temporal)
            e.update(prompt=prompt, DINO_THRESHOLD=float(threshold))
            with tempfile.TemporaryDirectory() as d:
                return track_video(model, variables, c, e, detector,
                                   video, d, int(max_frames),
                                   progress=progress, obj_mesh=obj_mesh)

        def run_auto(video, iou_threshold, points_per_side, size, det_every,
                     max_missed, temporal, sam_variant, suppress_small,
                     max_frames, progress=gr.Progress()):
            from deva_tpu.ext.automatic_processor import \
                process_frame_automatic
            if sam_variant in ("jax-mobile", "jax-light-hq"):
                from deva_tpu.ext.jax_sam import JaxMobileSAM
                generator = JaxMobileSAM(
                    hq=(sam_variant == "jax-light-hq"),
                    points_per_side=int(points_per_side),
                    pred_iou_thresh=float(iou_threshold))
            else:
                from deva_tpu.ext.detectors import HFAutomaticSAM
                generator = HFAutomaticSAM(
                    args.SAM_HF_PATH,
                    points_per_side=int(points_per_side),
                    pred_iou_thresh=float(iou_threshold))
            c, e = _per_run_cfg(size, det_every, max_missed, temporal)
            e.update(suppress_small_objects=bool(suppress_small),
                     SAM_NUM_POINTS_PER_SIDE=int(points_per_side),
                     SAM_PRED_IOU_THRESHOLD=float(iou_threshold))
            with tempfile.TemporaryDirectory() as d:
                return track_video(
                    model, variables, c, e, generator, video, d,
                    int(max_frames), process_fn=process_frame_automatic,
                    progress=progress, obj_mesh=obj_mesh)

        common = lambda: [
            gr.Slider(384, 1080, value=480, step=1,
                      label="Internal resolution"),
            gr.Slider(1, 100, value=5, step=1,
                      label="Incorporate detection every [X] frames"),
            gr.Slider(1, 100, value=10, step=1,
                      label="Delete segment if undetected for [X] times"),
            gr.Dropdown(choices=["semionline", "online"],
                        value="semionline", label="Temporal setting"),
        ]
        with gr.Blocks(title="deva_tpu: Tracking Anything "
                             "(TPU-native DEVA)") as app:
            with gr.Tab("Text-prompted"):
                gr.Interface(
                    fn=run_text,
                    inputs=[gr.Video(), gr.Text(label="Prompt (class1.class2)"),
                            gr.Slider(0.01, 0.99, value=0.35,
                                      label="Detection threshold"),
                            *common(), gr.Number(value=-1,
                                                 label="Max frames (-1=all)")],
                    outputs=gr.Video(),
                    title="Text-prompted open-vocabulary tracking "
                          "(Grounding DINO + SAM)")
            with gr.Tab("Automatic"):
                gr.Interface(
                    fn=run_auto,
                    inputs=[gr.Video(),
                            gr.Slider(0.01, 0.99, value=0.88,
                                      label="IoU threshold"),
                            gr.Slider(4, 256, value=32, step=1,
                                      label="Num. points per side for SAM"),
                            *common(),
                            gr.Dropdown(
                                choices=["jax-mobile", "jax-light-hq",
                                         "hf-sam"],
                                value="jax-mobile",
                                label="SAM variant (jax-* run TPU-native)"),
                            gr.Checkbox(label="Suppress small objects"),
                            gr.Number(value=-1, label="Max frames (-1=all)")],
                    outputs=gr.Video(),
                    title="Automatic grid-prompted tracking")
        app.launch()
    else:
        assert args.video, "--video is required in CLI mode"
        out = track_video(model, variables, cfg, ext_cfg, detector,
                          args.video, args.output, args.max_frames,
                          obj_mesh=obj_mesh)
        print(f"Output video: {out}")


if __name__ == "__main__":
    main()
