from deva_tpu.data.video_reader import VideoReader
from deva_tpu.data.detection_video_reader import DetectionVideoReader
from deva_tpu.data.simple_video_reader import SimpleVideoReader

__all__ = ["VideoReader", "DetectionVideoReader", "SimpleVideoReader"]
