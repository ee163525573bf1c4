from deva_tpu.models.network import DEVANetwork

__all__ = ["DEVANetwork"]
