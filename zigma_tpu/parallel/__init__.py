from zigma_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    zigma_param_sharding,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "zigma_param_sharding"]
