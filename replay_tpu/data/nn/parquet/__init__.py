from replay_tpu.data.nn.parquet.info import (
    DEFAULT_REPLICAS_INFO,
    ReplicasInfo,
    ReplicasInfoProtocol,
    curr_replica,
    num_replicas,
    partitioning_length,
    partitioning_per_replica,
    replica_indices,
)
from replay_tpu.data.nn.parquet.metadata import ColumnMeta, Metadata
from replay_tpu.data.nn.parquet.parquet_dataset import ParquetDataset
from replay_tpu.data.nn.parquet.parquet_module import ParquetModule

__all__ = [
    "ColumnMeta",
    "DEFAULT_REPLICAS_INFO",
    "ReplicasInfoProtocol",
    "Metadata",
    "ParquetDataset",
    "ParquetModule",
    "ReplicasInfo",
    "curr_replica",
    "num_replicas",
    "partitioning_length",
    "partitioning_per_replica",
    "replica_indices",
]
