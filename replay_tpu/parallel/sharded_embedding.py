"""Explicit row-sharded embedding lookup under shard_map.

The default path lets XLA lower gathers on a ``P('model', None)``-sharded
table automatically (replay_tpu/parallel/sharding.py).  This module is the
EXPLICIT formulation — the collective schedule written out — for cases
where the automatic lowering is suboptimal or where the surrounding
computation also runs under shard_map:

- ``a2a_sharded_lookup``: the north-star schedule (BASELINE.json: row-sharded
  table "with all-to-all ID exchange and gather").  Ids arrive SHARDED over
  the embedding axis; each device buckets its ids by owner shard,
  ``all_to_all``s the id buckets, gathers its owned rows, ``all_to_all``s
  the rows back, and un-permutes.  Per-device ICI traffic is
  O(S·C·D) where the per-peer capacity C defaults to ~2·n_local/S — i.e.
  ≈ 2·n_local·D/S, a factor S/4 less than the psum schedule below.  An
  overflow certificate (any bucket > C) lax.cond-falls back to the exact
  gather-psum path, so the result is exact for ANY id distribution —
  the same budget+certificate pattern as ops/pallas_topk.fused_topk_budget.
- ``sharded_lookup``: each shard gathers its owned rows for the (replicated)
  id batch, zeros elsewhere, and one ``psum`` over the ``model`` axis
  assembles full embeddings (per-device traffic ≈ 2·(S-1)/S·n·D).  The
  backward pass is the transpose: the incoming gradient is replicated, each
  shard scatter-adds into its own rows — exactly the owner-scatter
  semantics SURVEY.md §7 lists as a hard part, with duplicate ids handled
  by scatter-add.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def a2a_sharded_lookup(
    table_sharded: jnp.ndarray,  # [N, D] sharded P(axis, None)
    ids: jnp.ndarray,  # [n_global] int, sharded P(axis)
    mesh: Mesh,
    axis: str = "model",
    capacity: int | None = None,
) -> jnp.ndarray:
    """Embedding rows via all-to-all ID exchange (the north-star schedule).

    Each device owns a contiguous row block of the table AND a slice of the
    id batch.  Schedule per device (n = local id count, S = shards):

    1. bucket local ids by owner shard (stable argsort — keeps the inverse
       permutation cheap), positions within buckets from a bincount prefix;
    2. ``all_to_all`` a [S, C] id buffer (C = per-peer capacity, default
       2·⌈n/S⌉ rounded up) — each owner receives the ids it must serve;
    3. gather owned rows from the local table block → [S, C, D];
    4. ``all_to_all`` the rows back and un-permute into request order.

    Autodiff produces the transpose automatically: the cotangent rides the
    reverse ``all_to_all`` and scatter-adds into the owner's rows (duplicate
    ids accumulate — the `.at[].add` transpose of ``take``).

    Exactness: a skewed batch can overflow a bucket (> C ids for one owner).
    The kernel computes that certificate and ``lax.cond``-falls back to the
    exact all-gather + masked-gather + psum path for that batch, so results
    are exact for ANY distribution while the fast path rides ~2·n·D/S ICI
    bytes instead of the psum schedule's ~2·n·D.

    :param ids: 1-D int array, length divisible by the axis size, sharded
        over ``axis``.  (Flatten [B, L] batches first; reshape the result.)
    :returns: [n_global, D] embeddings sharded P(axis, None).
    """
    n_shards = mesh.shape[axis]
    n_total = table_sharded.shape[0]
    if n_total % n_shards:
        msg = (
            f"table rows ({n_total}) must divide evenly across the "
            f"{axis!r} axis ({n_shards} shards); pad the table "
            f"(e.g. utils.padded_rows) before sharding"
        )
        raise ValueError(msg)
    if ids.ndim != 1 or ids.shape[0] % n_shards:
        msg = (
            f"ids must be 1-D with length divisible by the {axis!r} axis "
            f"size {n_shards}, got shape {ids.shape}; flatten [B, L] "
            "batches and pad with the padding id first"
        )
        raise ValueError(msg)
    shard_rows = n_total // n_shards

    def local_fn(table_local, ids_local):
        n = ids_local.shape[0]
        cap = capacity if capacity is not None else _round_up(2 * -(-n // n_shards), 8)
        cap = min(cap, n)
        owner = ids_local // shard_rows  # [n]
        order = jnp.argsort(owner)  # jnp.argsort is stable
        sorted_ids = ids_local[order]
        sorted_owner = owner[order]
        counts = jnp.bincount(sorted_owner, length=n_shards)  # [S]
        starts = jnp.cumsum(counts) - counts
        pos = jnp.arange(n) - starts[sorted_owner]  # position within bucket
        # the certificate must be GLOBAL: every device takes the same cond
        # branch or the mismatched collectives deadlock the mesh
        overflow = (
            jax.lax.pmax(jnp.any(counts > cap).astype(jnp.int32), axis) > 0
        )

        def fast(_):
            send = jnp.full((n_shards, cap), -1, sorted_ids.dtype)
            send = send.at[sorted_owner, jnp.minimum(pos, cap - 1)].set(
                sorted_ids, mode="drop"
            )
            # [S, C]: row s = ids this device asks shard s for
            recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
            # recv row s = ids requested BY device s, all owned here
            base = jax.lax.axis_index(axis) * shard_rows
            local_rows = jnp.clip(recv - base, 0, shard_rows - 1)
            rows = jnp.take(table_local, local_rows, axis=0)  # [S, C, D]
            rows = jnp.where((recv >= 0)[..., None], rows, 0)
            back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0)
            # back[o, p] = row for my request with owner o, bucket position p
            gathered = back[sorted_owner, pos]  # [n, D] in sorted order
            out = jnp.zeros_like(gathered)
            return out.at[order].set(gathered)

        def exact(_):
            # all-gather ids, serve everyone, psum, slice my block back out
            all_ids = jax.lax.all_gather(ids_local, axis)  # [S, n]
            base = jax.lax.axis_index(axis) * shard_rows
            local_rows = all_ids - base
            mine = (local_rows >= 0) & (local_rows < shard_rows)
            rows = jnp.take(
                table_local, jnp.clip(local_rows, 0, shard_rows - 1), axis=0
            )
            rows = jnp.where(mine[..., None], rows, 0)
            full = jax.lax.psum(rows, axis)  # [S, n, D] replicated
            return full[jax.lax.axis_index(axis)]

        return jax.lax.cond(overflow, exact, fast, operand=None)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis, None),
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
