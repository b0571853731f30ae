"""Explicit sharded embedding lookup: forward and gradient equivalence."""

import pytest as _pytest

pytestmark = _pytest.mark.mesh

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from replay_tpu.parallel import make_mesh
from replay_tpu.parallel.sharded_embedding import (
    sharded_lookup,
    sharded_partial_logits,
)

rng = np.random.default_rng(0)


def setup(mesh, n=64, d=8):
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    return table, sharded


def test_lookup_matches_dense_take():
    mesh = make_mesh(data=2, model=4)
    table, sharded = setup(mesh)
    # duplicates + boundary ids on purpose
    ids = jnp.asarray([[0, 15, 16, 63], [5, 5, 5, 48]])
    got = sharded_lookup(sharded, ids, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.take(table, ids, axis=0)))


def test_gradient_scatter_adds_to_owners():
    """Backward must accumulate over DUPLICATE ids (SURVEY.md §7 hard part)."""
    mesh = make_mesh(data=1, model=4)
    table, sharded = setup(mesh)
    ids = jnp.asarray([3, 3, 3, 17, 60])  # 3 appears three times

    def loss_sharded(t):
        return jnp.sum(sharded_lookup(t, ids, mesh) ** 2)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    g_sharded = jax.grad(loss_sharded)(sharded)
    g_dense = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense), rtol=1e-6)
    # row 3's grad is 3x a single occurrence's
    np.testing.assert_allclose(
        np.asarray(g_sharded)[3], 3 * 2 * np.asarray(table)[3], rtol=1e-6
    )


def test_partial_logits_stay_sharded_and_feed_topk():
    mesh = make_mesh(data=1, model=8)
    table, sharded = setup(mesh, n=128, d=8)
    hidden = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    logits = sharded_partial_logits(hidden, sharded, mesh)
    assert logits.shape == (4, 128)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(hidden @ table.T), rtol=1e-4
    )
    # composes with distributed_topk for end-to-end sharded retrieval
    from replay_tpu.parallel.distributed_topk import distributed_topk

    vals, idx = distributed_topk(hidden, sharded, 5, mesh)
    ref_v, ref_i = jax.lax.top_k(hidden @ table.T, 5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
