"""Raw-frame reader for demos (no masks).

Behavioral anchor: reference:deva/inference/data/simple_video_reader.py:8-39.
"""
from deva_tpu.data.video_reader import SimpleVideoReader  # noqa: F401
