from deva_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from deva_tpu.parallel.sharded_attention import attend_mem_sharded, pad_tokens

__all__ = ["make_mesh", "shard_batch", "replicate", "attend_mem_sharded",
           "pad_tokens"]
