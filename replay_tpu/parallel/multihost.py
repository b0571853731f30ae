"""Multi-host initialization helpers.

The reference's multi-process story is Lightning DDP + torch.distributed
(reference: SURVEY.md §2.8); the TPU-native equivalent is
``jax.distributed.initialize`` + a mesh spanning all processes' devices.
Each host then reads its own data shard (replay_tpu/data/nn/parquet
ReplicasInfo keys off jax.process_index/count automatically) and the same
jitted train step runs SPMD across the slice — gradients all-reduce over
ICI within a slice and DCN across slices with no code changes.
"""

from typing import Optional, Sequence

import jax

from replay_tpu.parallel.mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the jax distributed runtime.

    On Cloud TPU the arguments are discovered from the environment; pass
    them explicitly for custom launchers.  Must run before any device use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_global_mesh(model: int = 1, axis_names: Sequence[str] = ("data", "model")):
    """Mesh over ALL processes' devices (call after initialize_multihost)."""
    return make_mesh(model=model, devices=jax.devices(), axis_names=axis_names)


def local_replica_info():
    """(replica_id, num_replicas) for host-side data sharding."""
    return jax.process_index(), jax.process_count()


def place_local_batch(batch, mesh, axis: str = "data"):
    """Assemble per-process batch shards into global arrays.

    Each process passes the rows ITS loader produced (the ReplicasInfo
    parquet shard); the result is one global array whose leading dim is
    sharded over ``axis`` — process p's rows live on process p's devices,
    so no batch data ever crosses hosts.  Leaves whose leading dim is not
    divisible by the local device count along ``axis`` (scalars, per-batch
    flags) are replicated — they must be identical across processes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    local_in_axis = max(1, mesh.shape[axis] // jax.process_count())

    def place(leaf):
        import numpy as np

        arr = np.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] % local_in_axis == 0:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, replicated)

    return jax.tree_util.tree_map(place, batch)


def to_host(x):
    """Device→host that also works for arrays spanning processes.

    ``np.asarray`` on a jax.Array whose shards live on another process's
    devices raises; this allgathers such arrays first (every process must
    call it — it is a collective in the multi-process case).  Fully
    addressable arrays take the plain fast path.
    """
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
