from zigma_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_train_state,
    train_state_sharding,
    zigma_param_sharding,
)
from zigma_tpu.parallel.pipeline import (
    pipeline_blocks,
    zigma_pipelined_apply,
)
from zigma_tpu.parallel.seq_parallel import (selective_scan_seq_parallel,
                                             ssd_seq_parallel)

__all__ = ["make_mesh", "shard_batch", "replicate", "zigma_param_sharding",
           "train_state_sharding", "shard_train_state",
           "pipeline_blocks", "zigma_pipelined_apply",
           "selective_scan_seq_parallel", "ssd_seq_parallel"]
