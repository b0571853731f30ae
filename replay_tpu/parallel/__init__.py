from replay_tpu.parallel.distributed_topk import distributed_topk
from replay_tpu.parallel.mesh import make_mesh
from replay_tpu.parallel.sharded_embedding import (
    a2a_sharded_lookup,
    sharded_lookup,
    sharded_partial_logits,
)
from replay_tpu.parallel.sharding import (
    batch_sharding,
    embedding_lookup,
    infer_param_shardings,
    shard_batch,
    shard_params,
)

__all__ = [
    "a2a_sharded_lookup",
    "distributed_topk",
    "make_mesh",
    "batch_sharding",
    "embedding_lookup",
    "infer_param_shardings",
    "shard_batch",
    "shard_params",
    "sharded_lookup",
    "sharded_partial_logits",
]
