from deva_tpu.training.data.vos_dataset import VOSDataset
from deva_tpu.training.data.static_dataset import StaticTransformDataset

__all__ = ["VOSDataset", "StaticTransformDataset"]
