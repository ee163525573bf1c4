"""Training-data helpers.

Behavioral anchor: reference:deva/dataset/utils.py. The augmentation pipeline
runs on host CPU (torchvision transforms over PIL images) and feeds numpy
batches to the jitted TPU train step — the same host/device split a grain
pipeline would have.
"""
import random

import numpy as np

im_mean = (124, 116, 104)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def reseed(seed: int) -> None:
    """Seed the stdlib RNG that drives the PIL transforms; calling this with
    the same seed before transforming an image and its mask replays the same
    geometric transform (reference:deva/dataset/utils.py reseed)."""
    random.seed(seed)


def normalize_chw(img_chw: np.ndarray) -> np.ndarray:
    """float [3,H,W] in [0,1] -> ImageNet-normalized."""
    return (img_chw - IMAGENET_MEAN[:, None, None]) / \
        IMAGENET_STD[:, None, None]


def all_to_onehot(masks: np.ndarray, labels) -> np.ndarray:
    shape = (len(labels), *masks.shape)
    out = np.zeros(shape, dtype=np.uint8)
    for ni, l in enumerate(labels):
        out[ni] = (masks == l).astype(np.uint8)
    return out
