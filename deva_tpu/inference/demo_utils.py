"""Demo helpers: raw RGB frame -> normalized resized array, and end-of-video
buffer flushing.

Behavioral anchor: reference:deva/inference/demo_utils.py:10-46.
"""
from __future__ import annotations

import numpy as np
from PIL import Image

from deva_tpu.data.transforms import normalize_image, min_side_size


def get_input_frame_for_deva(image_np: np.ndarray,
                             min_side: int) -> np.ndarray:
    """uint8 RGB [H,W,3] -> normalized float32 [H',W',3] (min-side resized)."""
    if min_side > 0:
        h, w = image_np.shape[:2]
        scale = min_side / min(h, w)
        new_h, new_w = int(h * scale), int(w * scale)
        if (new_h, new_w) != (h, w):
            image_np = np.asarray(
                Image.fromarray(image_np).resize((new_w, new_h),
                                                 Image.BILINEAR))
    return normalize_image(image_np)


def flush_buffer(deva, result_saver, prompts=None) -> None:
    """Propagate any frames still waiting in the semi-online buffer.
    reference:deva/inference/demo_utils.py:23-46."""
    need_resize = deva.cfg.size > 0
    for frame_info in deva.frame_buffer:
        image_np = getattr(frame_info, "image_np", None)
        shape = frame_info.info.get("shape")
        prob = deva.step(frame_info.image, None, None)
        result_saver.save_mask(np.asarray(prob), frame_info.name,
                               need_resize=need_resize, shape=shape,
                               image_np=image_np, prompts=prompts)
    deva.clear_buffer()
