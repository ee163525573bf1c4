from deva_tpu.inference.core import InferenceCore
from deva_tpu.inference.object_info import ObjectInfo

__all__ = ["InferenceCore", "ObjectInfo"]
