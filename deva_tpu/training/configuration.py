"""Training CLI: stage system with per-stage hyperparameters.

Behavioral anchor: reference:deva/utils/configuration.py:4-125 (same flags and
defaults; stage 0 = static pretrain, stage 3 = DAVIS+YouTubeVOS+OVIS main).
"""
from __future__ import annotations

from argparse import ArgumentParser


class Configuration:
    def parse(self, args=None, unknown_arg_ok: bool = False):
        parser = ArgumentParser()
        parser.add_argument("--benchmark", action="store_true")
        parser.add_argument("--amp", action="store_true",
                            help="bfloat16 compute (no loss scaling needed "
                            "on TPU)")
        parser.add_argument("--remat", action="store_true",
                            help="rematerialize sub-module activations in "
                            "the backward pass (jax.checkpoint): ~1/3 extra "
                            "FLOPs for an O(num_frames) cut in activation "
                            "HBM — enables larger per-device batches")

        # data roots
        parser.add_argument("--static_root", default="../static")
        parser.add_argument("--bl_root", default="../BL30K")
        parser.add_argument("--yv_root", default="../YouTube")
        parser.add_argument("--davis_root", default="../DAVIS")
        parser.add_argument("--ovis_root", default="../OVIS-VOS-train")
        parser.add_argument("--num_workers", type=int, default=16)
        parser.add_argument("--video_data_ratio", default=1.0, type=float)

        parser.add_argument("--pix_feat_dim", default=512, type=int)
        parser.add_argument("--key_dim", default=64, type=int)
        parser.add_argument("--value_dim", default=512, type=int)
        parser.add_argument("--deep_update_prob", default=0.2, type=float)

        parser.add_argument("--stages", default="03",
                            help="0-static images, 3-DAVIS+YouTubeVOS+OVIS")
        parser.add_argument("--clip_grad_norm", default=3.0, type=float)

        # stage 0
        parser.add_argument("--s0_batch_size", default=16, type=int)
        parser.add_argument("--s0_iterations", default=80000, type=int)
        parser.add_argument("--s0_steps", nargs="*", default=[], type=int)
        parser.add_argument("--s0_lr", default=2e-5, type=float)
        parser.add_argument("--s0_num_ref_frames", default=2, type=int)
        parser.add_argument("--s0_num_frames", default=3, type=int)
        parser.add_argument("--s0_start_warm", default=10000, type=int)
        parser.add_argument("--s0_end_warm", default=35000, type=int)
        parser.add_argument("--s0_schedule", default="constant")

        # stage 3
        parser.add_argument("--s3_batch_size", default=16, type=int)
        parser.add_argument("--s3_iterations", default=150000, type=int)
        parser.add_argument("--s3_steps", nargs="*",
                            default=[120000, 140000], type=int)
        parser.add_argument("--s3_lr", default=1e-5, type=float)
        parser.add_argument("--s3_num_ref_frames", default=3, type=int)
        parser.add_argument("--s3_num_frames", default=8, type=int)
        parser.add_argument("--s3_start_warm", default=10000, type=int)
        parser.add_argument("--s3_end_warm", default=35000, type=int)
        parser.add_argument("--s3_schedule", default="step")

        parser.add_argument("--gamma", default=0.1, type=float)
        parser.add_argument("--weight_decay", default=0.001, type=float)

        parser.add_argument("--load_network",
                            help="pretrained weights (.pth or .npz)")
        parser.add_argument("--load_checkpoint",
                            help="orbax checkpoint dir for resume")

        parser.add_argument("--log_text_interval", default=100, type=int)
        parser.add_argument("--log_image_interval", default=1500, type=int)
        parser.add_argument("--save_network_interval", default=50000,
                            type=int)
        parser.add_argument("--save_checkpoint_interval", default=50000,
                            type=int)
        parser.add_argument("--exp_id", default="NULL")
        parser.add_argument("--debug", action="store_true")

        parser.add_argument("--crop_size", type=int, default=384,
                            help="training crop size")
        # TPU-specific
        parser.add_argument("--multihost", action="store_true",
                            help="call jax.distributed.initialize() for "
                                 "pod-slice (multi-host DCN) training; run "
                                 "the same command on every host")
        parser.add_argument("--coordinator_address", default=None,
                            help="host:port of process 0's coordination "
                                 "service for --multihost (default: "
                                 "auto-detect, which works on Cloud TPU "
                                 "pods; set explicitly elsewhere, e.g. the "
                                 "2-process CPU dryrun in "
                                 "tests/test_multihost.py)")
        parser.add_argument("--num_processes", type=int, default=None,
                            help="total process count for --multihost "
                                 "(default: auto-detect)")
        parser.add_argument("--process_id", type=int, default=None,
                            help="this process's rank for --multihost "
                                 "(default: auto-detect)")
        parser.add_argument("--n_devices", type=int, default=-1,
                            help="data-parallel devices (-1 = all)")

        if unknown_arg_ok:
            parsed, _ = parser.parse_known_args(args)
        else:
            parsed = parser.parse_args(args)
        self.args = vars(parsed)

        for s in list(self.args["stages"]):
            if s not in ("0", "3"):
                raise NotImplementedError(s)

    def get_stage_parameters(self, stage: str) -> dict:
        return {
            "batch_size": self.args[f"s{stage}_batch_size"],
            "iterations": self.args[f"s{stage}_iterations"],
            "steps": self.args[f"s{stage}_steps"],
            "schedule": self.args[f"s{stage}_schedule"],
            "lr": self.args[f"s{stage}_lr"],
            "num_ref_frames": self.args[f"s{stage}_num_ref_frames"],
            "num_frames": self.args[f"s{stage}_num_frames"],
            "start_warm": self.args[f"s{stage}_start_warm"],
            "end_warm": self.args[f"s{stage}_end_warm"],
        }

    def __getitem__(self, key):
        return self.args[key]

    def __setitem__(self, key, value):
        self.args[key] = value

    def __str__(self):
        return str(self.args)
