"""Explicit row-sharded embedding lookup under shard_map.

The default path lets XLA lower gathers on a ``P('model', None)``-sharded
table automatically (replay_tpu/parallel/sharding.py).  This module is the
EXPLICIT formulation — the collective schedule written out — for cases
where the automatic lowering is suboptimal or where the surrounding
computation also runs under shard_map:

- ``sharded_lookup``: each shard gathers its owned rows for the (replicated)
  id batch, zeros elsewhere, and one ``psum`` over the ``model`` axis
  assembles full embeddings.  The backward pass is the transpose: the
  incoming gradient is replicated, each shard scatter-adds into its own
  rows — exactly the owner-scatter semantics SURVEY.md §7 lists as a hard
  part, with duplicate ids handled by scatter-add.
- ``sharded_partial_logits``: hidden × shard-local table rows → logits stay
  sharded ``P(None, 'model')``; feed them to
  replay_tpu/parallel/distributed_topk for retrieval without ever
  assembling [B, N] anywhere.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from replay_tpu.parallel.distributed_topk import shard_map


def sharded_lookup(
    table_sharded: jnp.ndarray,  # [N, D] sharded P('model', None)
    ids: jnp.ndarray,  # [...] int, replicated
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Embedding rows for ``ids`` with the table row-sharded over ``axis``.

    :returns: [..., D] replicated embeddings (differentiable; gradients
        scatter-add to the owning shard).
    """
    n_shards = mesh.shape[axis]
    n_total = table_sharded.shape[0]
    shard_rows = n_total // n_shards

    def local_fn(table_local, ids_rep):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * shard_rows
        local_ids = ids_rep - base
        mine = (local_ids >= 0) & (local_ids < shard_rows)
        safe = jnp.clip(local_ids, 0, shard_rows - 1)
        rows = jnp.take(table_local, safe, axis=0)
        rows = jnp.where(mine[..., None], rows, 0)
        return jax.lax.psum(rows, axis)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
    )
    return fn(table_sharded, ids)


def sharded_partial_logits(
    hidden: jnp.ndarray,  # [B, D] replicated
    table_sharded: jnp.ndarray,  # [N, D] sharded P('model', None)
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """[B, N] logits that stay column-sharded P(None, 'model') — each shard
    holds scores for its own catalog rows only."""

    def local_fn(h, table_local):
        return jnp.dot(h, table_local.T, preferred_element_type=jnp.float32)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(None, axis),
    )
    return fn(hidden, table_sharded)
