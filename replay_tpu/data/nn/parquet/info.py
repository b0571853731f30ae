"""Replica / partitioning math for multi-host streaming.

TPU-native analog of the reference's distributed-info protocols (reference:
replay/data/nn/parquet/info/replicas.py:7-68, partitioning.py:31-60).  The
reference folds DataLoader workers into DDP ranks
(``curr = worker_id + num_workers * rank``); on TPU the replica is the JAX
process (one data-loading process per host), so the default providers read
``jax.process_index()/process_count()`` — with the same pure-function shape
so tests can exercise any (replica, world) combination without multiple
processes (the reference's mock-based test pattern,
tests/data/nn/parquet/partitioning/test_partitioning.py:92-132).
"""

from math import ceil
from typing import Protocol

import numpy as np


class DistributedInfoProtocol(Protocol):
    @property
    def world_size(self) -> int: ...

    @property
    def rank(self) -> int: ...


class JaxProcessInfo:
    """Reads jax.process_index/process_count lazily (multi-host default).

    ``jax.process_count()`` initializes the backend, which can BLOCK
    indefinitely when an accelerator is configured but unreachable — a data
    loader must never hang on construction.  The query therefore runs in a
    daemon thread with a timeout: on TPU pods (where libtpu reports
    process_count > 1 even without ``jax.distributed.initialize``) it
    returns the real topology within milliseconds; a dead tunnel times out
    once, warns, and falls back to single-process (0, 1).  The result is
    cached either way."""

    _QUERY_TIMEOUT_S = 20.0
    _cached = None

    @classmethod
    def _query(cls):
        if cls._cached is not None:
            return cls._cached
        import threading
        import warnings

        result = {}

        def probe():
            import jax

            result["rank"] = jax.process_index()
            result["world"] = jax.process_count()

        thread = threading.Thread(target=probe, daemon=True)
        thread.start()
        thread.join(cls._QUERY_TIMEOUT_S)
        if "world" in result:
            cls._cached = (result["rank"], result["world"])
        else:
            warnings.warn(
                "jax backend initialization did not answer within "
                f"{cls._QUERY_TIMEOUT_S}s; assuming a single-process run "
                "(rank 0 / world 1) for data sharding"
            )
            cls._cached = (0, 1)
        return cls._cached

    @property
    def world_size(self) -> int:
        return self._query()[1]

    @property
    def rank(self) -> int:
        return self._query()[0]


class StaticInfo:
    """Fixed (rank, world_size) — for tests and custom launchers."""

    def __init__(self, rank: int = 0, world_size: int = 1, num_workers: int = 1, worker_id: int = 0):
        self._rank = rank
        self._world_size = world_size
        self.num_workers = num_workers
        self.id = worker_id

    @property
    def world_size(self) -> int:
        return self._world_size

    @property
    def rank(self) -> int:
        return self._rank


class WorkerInfoProtocol(Protocol):
    @property
    def num_workers(self) -> int: ...

    @property
    def id(self) -> int: ...


class SingleWorker:
    num_workers = 1
    id = 0


DEFAULT_DISTRIBUTED_INFO = JaxProcessInfo()
DEFAULT_WORKER_INFO = SingleWorker()


def num_replicas(
    worker_info: WorkerInfoProtocol = DEFAULT_WORKER_INFO,
    distributed_info: DistributedInfoProtocol = DEFAULT_DISTRIBUTED_INFO,
) -> int:
    return worker_info.num_workers * distributed_info.world_size


def curr_replica(
    worker_info: WorkerInfoProtocol = DEFAULT_WORKER_INFO,
    distributed_info: DistributedInfoProtocol = DEFAULT_DISTRIBUTED_INFO,
) -> int:
    result = worker_info.id + worker_info.num_workers * distributed_info.rank
    assert result < num_replicas(worker_info, distributed_info)
    return result


class ReplicasInfo:
    """Replica metadata provider (reference: info/replicas.py:31)."""

    def __init__(
        self,
        worker_info: WorkerInfoProtocol = DEFAULT_WORKER_INFO,
        distributed_info: DistributedInfoProtocol = DEFAULT_DISTRIBUTED_INFO,
    ) -> None:
        self.worker_info = worker_info
        self.distributed_info = distributed_info

    @property
    def num_replicas(self) -> int:
        return num_replicas(self.worker_info, self.distributed_info)

    @property
    def curr_replica(self) -> int:
        return curr_replica(self.worker_info, self.distributed_info)


def partitioning_length(length: int, n_replicas: int) -> int:
    """Dataset length padded up to a multiple of n_replicas (reference:
    info/partitioning.py:31-46)."""
    if length <= 0 or n_replicas <= 0:
        msg = f"invalid length={length} num_replicas={n_replicas}"
        raise ValueError(msg)
    if length % n_replicas == 0:
        return length
    return ceil(length / n_replicas) * n_replicas


def partitioning_per_replica(length: int, n_replicas: int) -> int:
    """Rows served to each replica (reference: info/partitioning.py:50-60)."""
    return partitioning_length(length, n_replicas) // n_replicas


def replica_indices(
    length: int,
    replica: int,
    n_replicas: int,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
) -> np.ndarray:
    """This replica's row indices; padded tail wraps to the front rows so
    every replica sees the same count (static shapes downstream)."""
    order = np.arange(length)
    if shuffle:
        rng = np.random.Generator(np.random.Philox(key=[seed, epoch]))
        rng.shuffle(order)
    padded = partitioning_length(length, n_replicas)
    order = np.resize(order, padded)
    return order[replica::n_replicas]


# Reference names (replay/data/nn/parquet/info/replicas.py:23,68): the
# replica = worker × rank composition protocol and its process-default
# instance.
class ReplicasInfoProtocol(Protocol):
    @property
    def num_replicas(self) -> int: ...

    @property
    def curr_replica(self) -> int: ...


DEFAULT_REPLICAS_INFO: ReplicasInfoProtocol = ReplicasInfo()
