"""Execute the --multihost (DCN) training path: a real 2-process CPU
jax.distributed run of deva_tpu.training.train (VERDICT r4 #7).

The reference's multi-GPU recipe is torch.distributed.run process-per-GPU
(reference:deva/train.py:22, docs/TRAINING.md:42). Our equivalent is the
SAME program on every host with jax.distributed.initialize wiring the
coordination service; the mesh then spans all hosts and the gradient psum
rides DCN. Cloud TPU pods auto-detect the coordinator; this test pins the
explicit-flag path (--coordinator_address/--num_processes/--process_id) on
a 2-process CPU cluster with 1 virtual device each: both processes must
rendezvous, see a 2-device global mesh, shard the global batch per process
(local loaders at batch/process_count, mesh.py shard_batch's
make_array_from_process_local_data path), run one optimizer step with the
cross-process gradient psum, and exit 0.

Guard rails for the one-core box: tiny model dims, 64px crops, 1
iteration, generous join timeout (the two processes timeshare one core
through compile).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_static_root(tmp_path):
    """The six saliency dirs deva_tpu.training.train stage 0 expects:
    fss (method 0: class subdirs) + five flat method-1 dirs."""
    rng = np.random.default_rng(0)
    root = tmp_path / "static"

    def put_pair(d, name):
        os.makedirs(d, exist_ok=True)
        img = rng.integers(0, 255, (80, 100, 3), np.uint8)
        Image.fromarray(img).save(d / f"{name}.jpg")
        gt = np.zeros((80, 100), np.uint8)
        gt[20:60, 30:70] = 255
        Image.fromarray(gt).save(d / f"{name}.png")

    for c in ("a", "b"):
        for i in range(2):
            put_pair(root / "fss" / c, f"{c}{i}")
    for d in ("DUTS-TR", "DUTS-TE", "ecssd", "BIG_small", "HRSOD_small"):
        for i in range(2):
            put_pair(root / d, f"{d}{i}")
    return str(root)


@pytest.mark.slow
def test_multihost_two_process_cpu(tmp_path):
    static_root = _make_static_root(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def launch(pid):
        env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        return subprocess.Popen(
            [sys.executable, "-m", "deva_tpu.training.train",
             "--multihost",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--stages", "0", "--s0_batch_size", "2",
             "--s0_iterations", "1", "--static_root", static_root,
             "--num_workers", "0", "--crop_size", "64",
             "--pix_feat_dim", "32", "--key_dim", "16",
             "--value_dim", "32", "--exp_id", "NULL", "--debug"],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    procs = [launch(0), launch(1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} rc={p.returncode}\n" \
                                  f"{out[-3000:]}"
    joined = "\n".join(outs)
    assert "multi-host: process 0 of 2" in joined, joined[-2000:]
    assert "multi-host: process 1 of 2" in joined, joined[-2000:]
    assert "Data-parallel over 2 devices." in joined, joined[-2000:]
