"""Distributed full-catalog top-k over a row-sharded item table.

The reference's serving path collects per-rank predictions into Spark
frames (reference: replay/models/nn/sequential/callbacks/
prediction_callbacks.py:180 SparkPredictionCallback); the TPU-native
equivalent keeps the catalog row-sharded over the ``model`` mesh axis and
merges per-shard top-k candidates with ONE all-gather of [B, k] blocks —
k·n_shards candidates instead of the full [B, N] logits ever crossing ICI
(SURVEY.md §7: distributed top-k = per-shard topk → all-gather → merge).

Works under shard_map: each device scores its local item rows, takes a
local top-k with GLOBAL indices (shard offset added), all-gathers the
candidate blocks along ``model``, and reduces to the exact global top-k.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import inspect

try:  # jax ≥ 0.7 top-level API; experimental path kept for older versions
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

# the replication-check kwarg was renamed check_rep → check_vma across jax
# versions; the merged top-k is replicated by construction (all_gather +
# identical reduction) so the check must be off either way
_CHECK_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)


def shard_map(f, *, mesh, in_specs, out_specs):
    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{_CHECK_KW: False}
    )


def distributed_topk(
    queries: jnp.ndarray,  # [B, D] replicated
    items_sharded: jnp.ndarray,  # [N, D] sharded P('model', None)
    k: int,
    mesh: Mesh,
    axis: str = "model",
):
    """Exact global top-k of Q·Wᵀ with W row-sharded over ``axis``.

    :returns: (values [B, k], indices [B, k]) replicated on every device.
    """
    n_shards = mesh.shape[axis]
    n_total = items_sharded.shape[0]
    shard_rows = n_total // n_shards

    def local_fn(q, w_local):
        # w_local: [N/n_shards, D] this shard's rows
        scores = jnp.dot(q, w_local.T, preferred_element_type=jnp.float32)
        k_local = min(k, w_local.shape[0])
        vals, idx = jax.lax.top_k(scores, k_local)
        shard_id = jax.lax.axis_index(axis)
        idx = idx + shard_id * shard_rows
        # gather all shards' candidate blocks → [B, n_shards*k_local]
        vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(vals_all, min(k, vals_all.shape[1]))
        top_idx = jnp.take_along_axis(idx_all, pos, axis=1)
        return top_vals, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
    )
    return fn(queries, items_sharded)
