"""Streaming out-of-core parquet dataset.

TPU-native analog of the reference ParquetDataset (reference:
replay/data/nn/parquet/parquet_dataset.py:27 with BatchesIterator
iterator.py, FixedBatchSizeDataset fixed_batch_dataset.py,
PartitionedIterableDataset partitioned_iterable_dataset.py).

Pipeline per epoch:
  pyarrow dataset scan (``partition_size`` rows per fragment read)
  → deterministic partition-order + in-partition shuffling (Philox keyed on
    (seed, epoch) — replica-stable)
  → replica sharding of rows (``curr = process_index``; contract of
    replay_tpu/data/nn/parquet/info.py)
  → re-chunk into EXACT ``batch_size`` dict-of-ndarray batches, ragged list
    columns padded per the Metadata declaration with ``{col}_mask`` masks;
  → the final short batch is padded with repeated rows and flagged by
    ``batch_mask``, keeping every batch shape static for jit.
"""

from typing import Dict, Iterator, List, Optional

import numpy as np

from replay_tpu.data.nn.parquet.info import ReplicasInfo, replica_indices
from replay_tpu.data.nn.parquet.metadata import Metadata, mask_name, pad_column

Batch = Dict[str, np.ndarray]


class ParquetDataset:
    """Iterable batches over one or more parquet files/directories."""

    def __init__(
        self,
        source,
        metadata: Metadata,
        batch_size: int,
        partition_size: int = 65536,
        shuffle: bool = False,
        seed: int = 0,
        replicas_info: Optional[ReplicasInfo] = None,
        replica_id: Optional[int] = None,
        num_replicas: Optional[int] = None,
        drop_last: bool = False,
    ):
        """
        :param source: path / list of paths to parquet files or directories.
        :param metadata: per-column shape/padding declarations.
        :param replica_id/num_replicas: explicit replica override; defaults
            to ``replicas_info`` (jax process index/count).
        """
        import pyarrow.dataset as pads

        self._dataset = pads.dataset(source, format="parquet")
        self.metadata = metadata
        self.batch_size = batch_size
        self.partition_size = partition_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        if replica_id is not None and num_replicas is not None:
            self._replica = (replica_id, num_replicas)
        else:
            info = replicas_info or ReplicasInfo()
            try:
                self._replica = (info.curr_replica, info.num_replicas)
            except Exception:
                self._replica = (0, 1)
        self._epoch = 0
        self._n_rows = self._dataset.count_rows()

    def __len__(self) -> int:
        """Number of batches this replica yields per epoch."""
        n_replicas = self._replica[1]
        per_replica = -(-self._n_rows // n_replicas) if n_replicas > 1 else self._n_rows
        if self.drop_last:
            return per_replica // self.batch_size
        return -(-per_replica // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Advance the shuffle stream (reference epoch semantics)."""
        self._epoch = epoch

    # ------------------------------------------------------------- iteration
    def _row_batches(self) -> Iterator[Dict[str, List]]:
        """Yield raw column-list chunks of this replica's rows."""
        replica, n_replicas = self._replica
        indices = replica_indices(
            self._n_rows,
            replica,
            n_replicas,
            shuffle=self.shuffle,
            seed=self.seed,
            epoch=self._epoch,
        )
        # sort within partitions for sequential reads; take() handles the rest
        columns = self.metadata.names
        for start in range(0, len(indices), self.partition_size):
            chunk = indices[start : start + self.partition_size]
            table = self._dataset.take(np.sort(chunk), columns=columns)
            data = {name: table.column(name).to_pylist() for name in columns}
            if self.shuffle:
                # restore shuffled order within the partition
                order = np.argsort(np.argsort(chunk))
                data = {k: [v[i] for i in order] for k, v in data.items()}
            yield data

    def __iter__(self) -> Iterator[Batch]:
        pending: Dict[str, List] = {name: [] for name in self.metadata.names}
        count = 0

        def emit(rows: Dict[str, List], real: int) -> Batch:
            batch: Batch = {}
            for name, meta in self.metadata.items():
                values = rows[name]
                if len(values) < self.batch_size:  # pad final batch
                    values = values + [values[-1]] * (self.batch_size - len(values))
                arr, mask = pad_column(values, meta)
                batch[name] = arr
                if mask is not None:
                    batch[mask_name(name)] = mask
            bm = np.zeros(self.batch_size, dtype=np.int8)
            bm[:real] = 1
            batch["batch_mask"] = bm
            return batch

        for part in self._row_batches():
            n = len(next(iter(part.values())))
            for name in pending:
                pending[name].extend(part[name])
            count += n
            while count >= self.batch_size:
                rows = {name: vals[: self.batch_size] for name, vals in pending.items()}
                pending = {name: vals[self.batch_size :] for name, vals in pending.items()}
                count -= self.batch_size
                yield emit(rows, self.batch_size)
        if count and not self.drop_last:
            yield emit(pending, count)
