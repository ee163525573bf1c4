"""Differential test: established-association consensus (referring/saliency
path) vs the reference, plus an end-to-end synthetic saliency driver run."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deva_tpu.config import InferenceConfig, ModelConfig
from deva_tpu.inference.consensus import \
    find_consensus_with_established_association
from deva_tpu.inference.core import InferenceCore
from deva_tpu.models.network import DEVANetwork

from helpers_ref import build_reference_deva, converted_variables

H, W = 64, 96


@pytest.fixture(scope="module")
def setup():
    ref_net = build_reference_deva(seed=0)
    variables = converted_variables(ref_net)
    model = DEVANetwork(ModelConfig())
    return ref_net, model, variables


def _soft_video(rng, t=4, num_obj=2):
    images, masks = [], []
    base = rng.standard_normal((H // 8, W // 8, 3)).astype(np.float32)
    for i in range(t):
        img = base + 0.1 * rng.standard_normal((H // 8, W // 8, 3))
        images.append(np.kron(img, np.ones((8, 8, 1))).astype(np.float32))
        m = np.zeros((num_obj, H, W), np.float32)
        m[0, 8:28, 10 + i:40 + i] = 0.9
        if num_obj > 1:
            m[1, 36:60, 50:90] = 0.85
        masks.append(m)
    return images, masks


@pytest.mark.parametrize("use_scores", [True, False])
def test_established_association_consensus_parity(setup, use_scores):
    ref_net, model, variables = setup
    from deva.inference.consensus_associated import \
        find_consensus_with_established_association as ref_consensus
    from deva.inference.image_feature_store import \
        ImageFeatureStore as RefStore

    rng = np.random.default_rng(11)
    images, masks = _soft_video(rng)
    time_indices = [0, 2, 5, 9]
    scores = [0.3, 0.9, 0.5, 0.7] if use_scores else None

    cfg = {"pix_feat_dim": 512, "key_dim": 64, "value_dim": 512,
           "top_k": 8, "chunk_size": -1}
    with torch.no_grad():
        ref_store = RefStore(ref_net)
        r_key_ti, r_mask = ref_consensus(
            list(time_indices),
            [torch.from_numpy(np.moveaxis(i, -1, 0)).contiguous()
             for i in images],
            [torch.from_numpy(m) for m in masks],
            network=ref_net, store=ref_store, config=cfg,
            scores=list(scores) if scores else None)
        for ti in time_indices:
            ref_store.delete(ti)

    core = InferenceCore(model, variables, InferenceConfig(top_k=8))
    o_key_ti, o_mask = find_consensus_with_established_association(
        list(time_indices), [i.copy() for i in images],
        [m.copy() for m in masks], core,
        scores=list(scores) if scores else None)

    assert o_key_ti == r_key_ti
    np.testing.assert_allclose(o_mask, r_mask.numpy(), atol=2e-3)


def test_eval_saliency_end_to_end(tmp_path):
    """Drive the saliency driver on a synthetic on-disk dataset."""
    from PIL import Image
    rng = np.random.default_rng(12)
    images, masks = _soft_video(rng, t=5, num_obj=1)
    img_dir = tmp_path / "JPEGImages" / "vid0"
    mask_dir = tmp_path / "Saliency" / "vid0"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    for i, (img, m) in enumerate(zip(images, masks)):
        arr = np.clip((img - img.min()) / (np.ptp(img) + 1e-6) * 255, 0,
                      255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:05d}.jpg")
        Image.fromarray((m[0] * 255).astype(np.uint8)).save(
            mask_dir / f"{i:05d}.png")

    import subprocess
    import sys
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "evaluation/eval_saliency.py",
         "--img_path", str(tmp_path / "JPEGImages"),
         "--mask_path", str(tmp_path / "Saliency"),
         "--output", str(tmp_path / "out"),
         "--model", "", "--size", "-1", "--num_voting_frames", "3",
         "--top_k", "8"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    pngs = sorted(os.listdir(tmp_path / "out" / "vid0"))
    assert len([p for p in pngs if p.endswith(".png")]) == 5
    assert "key.txt" in pngs
