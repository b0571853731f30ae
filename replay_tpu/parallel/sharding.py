"""Sharding rules: param pytrees and batches → NamedShardings.

Replaces the reference's implicit DDP replication (Lightning) with explicit
XLA shardings: embedding tables row-shard over the ``model`` axis, all other
params replicate, batches shard over ``data``.  XLA then inserts the
collectives (grad psum over ``data``; gather/permute chains for sharded
table lookups) — the "annotate and let the compiler place collectives"
recipe of the scaling playbook.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# embedding tables bigger than this row count are worth sharding; small
# tables (positions, tiny feature vocabs) replicate to avoid gather chatter
_SHARD_ROW_THRESHOLD = 16384


def infer_param_shardings(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a flax param tree.

    Rule: any leaf named ``embedding`` (flax ``nn.Embed`` weight) whose row
    count is large AND divisible by the model-axis size is sharded
    P('model', None); everything else replicates.
    """
    model_size = mesh.shape.get("model", 1)

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if (
            model_size > 1
            and names
            and names[-1] == "embedding"
            and leaf.ndim == 2
            and leaf.shape[0] >= _SHARD_ROW_THRESHOLD
            and leaf.shape[0] % model_size == 0
        ):
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def embedding_lookup(
    table: Any,
    ids: Any,
    mesh: Mesh,
    schedule: str = "auto",
    axis: str = "model",
) -> Any:
    """Row-sharded embedding lookup with a selectable collective schedule.

    - ``"auto"``/``"xla"``: plain ``take`` on the annotated table — XLA
      lowers the gather-on-sharded-operand itself (the default the models
      use via ``nn.Embed``).
    - ``"psum"``: explicit masked-gather + psum
      (:func:`replay_tpu.parallel.sharded_embedding.sharded_lookup`) —
      replicated ids, ~2·n·D bytes/device.
    - ``"a2a"``: the north-star all-to-all ID exchange
      (:func:`replay_tpu.parallel.sharded_embedding.a2a_sharded_lookup`) —
      ids sharded over ``axis``, ~2·n·D/S bytes/device with an exactness
      fallback for skewed batches.  BASELINE.json north-star schedule.

    ``ids`` may be any shape; they are flattened for the explicit schedules
    and the result is reshaped to ``ids.shape + (D,)``.
    """
    import jax.numpy as jnp

    if schedule in ("auto", "xla"):
        return jnp.take(table, ids, axis=0)
    from replay_tpu.parallel.sharded_embedding import (
        a2a_sharded_lookup,
        sharded_lookup,
    )

    if schedule == "psum":
        return sharded_lookup(table, ids, mesh, axis=axis)
    if schedule == "a2a":
        flat = ids.reshape(-1)
        out = a2a_sharded_lookup(table, flat, mesh, axis=axis)
        return out.reshape(*ids.shape, table.shape[1])
    msg = f"unknown embedding lookup schedule: {schedule!r}"
    raise ValueError(msg)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = infer_param_shardings(params, mesh)
    return jax.device_put(params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sharding = batch_sharding(mesh)

    def place(leaf):
        if leaf.ndim == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, batch)
