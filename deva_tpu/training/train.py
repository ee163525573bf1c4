"""Multi-stage training driver (SPMD over a TPU mesh).

Behavioral anchor: reference:deva/train.py — the same stage system ('0' static
pretrain, '3' DAVIS+YouTubeVOS+OVIS), max_skip curriculum, dataset mix, and
save cadence (densified near the end). Differences (TPU-native by design):
  - one jitted data-parallel train step over a jax Mesh replaces
    DDP/NCCL process-per-GPU (multi-host works via jax.distributed.initialize
    before calling main)
  - orbax checkpoints + .npz weight exports replace torch .pth
  - host-side torch DataLoader workers feed numpy batches (the host/device
    pipeline the reference gets from CUDA DataLoaders)

Run: python -m deva_tpu.training.train --stages 03 --exp_id my_run ...
"""
from __future__ import annotations

import datetime
import random
from os import path

import jax
import numpy as np

from deva_tpu.config import ModelConfig, TrainConfig
from deva_tpu.models.network import DEVANetwork
from deva_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from deva_tpu.training import checkpoint as ckpt
from deva_tpu.training.configuration import Configuration
from deva_tpu.training.data import StaticTransformDataset, VOSDataset
from deva_tpu.training.trainer import (init_train_state,
                                       make_eval_outputs, make_optimizer,
                                       make_train_step)
from deva_tpu.utils.load_subset import load_sub_davis, load_sub_yv
from deva_tpu.utils.logger import Integrator, TensorboardLogger

import jax.numpy as jnp


def _numpy_collate(batch):
    out = {}
    for k in ("rgb", "first_frame_gt", "cls_gt", "selector"):
        out[k] = np.stack([b[k] for b in batch])
    out["num_objects"] = np.array([b["info"]["num_objects"] for b in batch])
    return out


def build_loader(dataset, batch_size: int, num_workers: int, seed: int):
    import torch
    from torch.utils.data import DataLoader

    def worker_init_fn(worker_id):
        np.random.seed(seed + worker_id)
        random.seed(seed + worker_id)

    # deterministic shuffle, decorrelated across hosts (the multihost
    # analog of the reference's DistributedSampler epoch seeding,
    # reference:deva/train.py:119-121 — each host draws an independent
    # stream over the augmented datasets rather than a disjoint partition)
    gen = torch.Generator()
    gen.manual_seed(1000 * seed + jax.process_index())
    return DataLoader(dataset, batch_size=batch_size, shuffle=True,
                      num_workers=num_workers, drop_last=True,
                      collate_fn=_numpy_collate, generator=gen,
                      worker_init_fn=worker_init_fn)


def main(argv=None):
    raw_config = Configuration()
    raw_config.parse(argv)

    if raw_config["multihost"]:
        # Multi-host (pod-slice / DCN) SPMD: every host runs this same
        # program; jax.distributed.initialize wires the coordination
        # service (auto-detected on Cloud TPU) and jax.devices() then spans
        # ALL hosts. This replaces the reference's torch.distributed.run
        # process-per-GPU launch (reference:deva/train.py:22,
        # docs/TRAINING.md:42); gradients still all-reduce through the
        # compiler-inserted psum — over ICI within a slice, DCN across.
        from jax import distributed as jax_distributed
        jax_distributed.initialize(
            coordinator_address=raw_config["coordinator_address"],
            num_processes=raw_config["num_processes"],
            process_id=raw_config["process_id"])
        print(f"multi-host: process {jax.process_index()} of "
              f"{jax.process_count()}", flush=True)

    n_devices = raw_config["n_devices"]
    if n_devices <= 0:
        n_devices = len(jax.devices())
    mesh = make_mesh(n_devices, 1)
    print(f"Data-parallel over {n_devices} devices.")

    network_in_memory = None
    stages = raw_config["stages"]
    total_iter = 0

    for si, stage in enumerate(list(stages)):
        np.random.seed(14159265)
        random.seed(14159265)

        stage_params = raw_config.get_stage_parameters(stage)
        exp_id = raw_config["exp_id"]
        if exp_id != "NULL":
            exp_id = exp_id + "-s%s" % stages[:si + 1]
        batch_size = stage_params["batch_size"]
        assert batch_size % n_devices == 0, \
            f"batch {batch_size} must divide over {n_devices} devices"
        # per-process loader batch: the global batch divides over hosts,
        # as the reference divides by world size (reference:deva/train.py:
        # 59-63); single-host keeps the full batch
        local_batch = batch_size // jax.process_count()

        long_id = None
        if exp_id.lower() != "null":
            long_id = "%s-%s" % (
                datetime.datetime.now().strftime("%b%d-%H.%M.%S"), exp_id)
        logger = TensorboardLogger(exp_id, long_id)
        logger.log_string("hyperparameters", str(raw_config))
        save_path = path.join("saves", long_id, exp_id) if long_id else None

        cfg = TrainConfig(
            batch_size=batch_size,
            num_frames=stage_params["num_frames"],
            num_ref_frames=stage_params["num_ref_frames"],
            lr=stage_params["lr"],
            weight_decay=raw_config["weight_decay"],
            iterations=stage_params["iterations"],
            steps=tuple(stage_params["steps"]),
            gamma=raw_config["gamma"],
            clip_grad_norm=raw_config["clip_grad_norm"],
            deep_update_prob=raw_config["deep_update_prob"],
            start_warm=stage_params["start_warm"],
            end_warm=stage_params["end_warm"],
            remat=raw_config["remat"],
        )
        mc = ModelConfig(pix_feat_dim=raw_config["pix_feat_dim"],
                         key_dim=raw_config["key_dim"],
                         value_dim=raw_config["value_dim"],
                         dtype="bfloat16" if raw_config["amp"] else
                         "float32")
        model = DEVANetwork(mc)

        rng = jax.random.PRNGKey(14159265)
        variables = model.init(
            rng, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 1, 64, 64)),
            jnp.zeros((1, 1, 4, 4, mc.value_dim)))
        if network_in_memory is not None:
            print("Loading weights from the previous stage")
            variables = network_in_memory
            network_in_memory = None
        elif raw_config["load_network"] is not None:
            variables = ckpt.load_network_weights(raw_config["load_network"])
            raw_config["load_network"] = None
            print("Pretrained weights loaded.")

        tx = make_optimizer(cfg, schedule=stage_params["schedule"])
        state = init_train_state(model, variables, tx)
        total_iter = 0
        if raw_config["load_checkpoint"] is not None:
            state, total_iter = ckpt.load_checkpoint(
                state, raw_config["load_checkpoint"])
            raw_config["load_checkpoint"] = None
        state = replicate(mesh, state)
        train_step = make_train_step(model, tx, cfg, mesh=mesh)
        eval_outputs = make_eval_outputs(model, cfg)

        # datasets (reference:deva/train.py:166-194)
        max_skip_values = [10, 15, 5, 5]
        increase_skip_fraction = [0.1, 0.3, 0.8, 100]
        if stage == "0":
            static_root = path.expanduser(raw_config["static_root"])
            dataset = StaticTransformDataset([
                (path.join(static_root, "fss"), 0, 1),
                (path.join(static_root, "DUTS-TR"), 1, 1),
                (path.join(static_root, "DUTS-TE"), 1, 1),
                (path.join(static_root, "ecssd"), 1, 1),
                (path.join(static_root, "BIG_small"), 1, 5),
                (path.join(static_root, "HRSOD_small"), 1, 5),
            ], num_frames=cfg.num_frames, max_num_obj=1,
               size=raw_config["crop_size"])
            loader = build_loader(dataset, local_batch,
                                  raw_config["num_workers"], seed=total_iter)
            renew_loader = None
        else:
            yv_root = path.join(path.expanduser(raw_config["yv_root"]),
                                "train")
            davis_root = path.join(path.expanduser(raw_config["davis_root"]),
                                   "2017", "trainval")
            ovis_root = path.expanduser(raw_config["ovis_root"])

            def renew_loader(max_skip):
                from torch.utils.data import ConcatDataset
                yv = VOSDataset(path.join(yv_root, "JPEGImages"),
                                path.join(yv_root, "Annotations"),
                                max_skip // 5, subset=load_sub_yv(),
                                num_frames=cfg.num_frames,
                                size=raw_config["crop_size"],
                                data_ratio=raw_config["video_data_ratio"])
                davis = VOSDataset(path.join(davis_root, "JPEGImages",
                                             "480p"),
                                   path.join(davis_root, "Annotations",
                                             "480p"),
                                   max_skip, subset=load_sub_davis(),
                                   num_frames=cfg.num_frames,
                                   size=raw_config["crop_size"],
                                   data_ratio=raw_config["video_data_ratio"])
                ovis = VOSDataset(path.join(ovis_root, "JPEGImages"),
                                  path.join(ovis_root, "Annotations"),
                                  max_skip // 5, subset=None,
                                  num_frames=cfg.num_frames,
                                  size=raw_config["crop_size"],
                                  data_ratio=raw_config["video_data_ratio"])
                mixed = ConcatDataset([davis] * 5 + [yv] + [ovis] * 3)
                print(f"Renewed loaders with max_skip={max_skip}; "
                      f"sizes: davis={len(davis)}, yv={len(yv)}, "
                      f"ovis={len(ovis)}")
                return build_loader(mixed, local_batch,
                                    raw_config["num_workers"],
                                    seed=total_iter)

            loader = renew_loader(5)

        change_skip_iter = [round(cfg.iterations * f)
                            for f in increase_skip_fraction]
        integrator = Integrator(logger)
        save_network_interval = raw_config["save_network_interval"]
        key = jax.random.PRNGKey(total_iter)

        try:
            while total_iter < cfg.iterations:
                for batch in loader:
                    if stage != "0" and total_iter >= change_skip_iter[0]:
                        while total_iter >= change_skip_iter[0]:
                            cur_skip = max_skip_values.pop(0)
                            change_skip_iter.pop(0)
                        print(f"Changing skip to {cur_skip}")
                        loader = renew_loader(cur_skip)
                        break
                    if stage != "0" and \
                            (cfg.iterations - total_iter <= 5000):
                        save_network_interval = 1000

                    batch.pop("num_objects", None)
                    sharded = shard_batch(mesh, batch)
                    key, sub = jax.random.split(key)
                    # numpy key: multi-process jit accepts host-local numpy
                    # as replicated input (same seed on every host); a
                    # process-committed device array would not reshard
                    # across hosts
                    state, metrics = train_step(state, sharded,
                                                np.asarray(sub))
                    integrator.add_dict(
                        {k: v for k, v in metrics.items()
                         if k in ("total_loss", "p", "grad_norm")})
                    total_iter += 1

                    if total_iter % raw_config["log_text_interval"] == 0:
                        integrator.finalize("train", total_iter)
                        integrator.reset_except_hooks()
                    if logger.writer is not None and total_iter % \
                            raw_config["log_image_interval"] == 0:
                        from deva_tpu.utils.image_saver import pool_pairs
                        outs = eval_outputs(state, sharded, sub)
                        logger.log_image(
                            "train/pairs",
                            pool_pairs(batch, jax.device_get(outs)),
                            total_iter)
                    if save_path and \
                            total_iter % save_network_interval == 0:
                        ckpt.save_network(state, save_path, total_iter)
                    if save_path and total_iter % \
                            raw_config["save_checkpoint_interval"] == 0:
                        ckpt.save_checkpoint(state, save_path, total_iter)
                    if total_iter >= cfg.iterations:
                        break
        finally:
            if save_path and not raw_config["debug"] and total_iter > 5000:
                ckpt.save_network(state, save_path, total_iter)
                ckpt.save_checkpoint(state, save_path, total_iter)

        network_in_memory = {"params": jax.device_get(state.params),
                             "batch_stats": jax.device_get(
                                 state.batch_stats)}


if __name__ == "__main__":
    main()
