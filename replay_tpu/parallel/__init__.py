from replay_tpu.parallel.distributed_topk import distributed_topk
from replay_tpu.parallel.mesh import make_mesh
from replay_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_shardings,
    shard_batch,
    shard_params,
)

__all__ = [
    "distributed_topk",
    "make_mesh",
    "batch_sharding",
    "infer_param_shardings",
    "shard_batch",
    "shard_params",
]
