"""Tiled exact-CE tests."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from replay_tpu.nn.losses import CELoss
from replay_tpu.nn.tiled_ce import CELossTiled

rng = np.random.default_rng(0)
B, L, D, N = 4, 6, 16, 100


@pytest.fixture()
def inputs():
    hidden = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, N, (B, L)))
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32))
    weights = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.1)
    return hidden, labels, mask, weights


@pytest.mark.parametrize("tile", [32, 100, 128])
def test_matches_dense_ce(inputs, tile):
    hidden, labels, mask, weights = inputs
    dense = CELoss()(hidden, labels, mask, weights)
    tiled = CELossTiled(tile=tile)(hidden, labels, mask, weights)
    np.testing.assert_allclose(dense, tiled, rtol=1e-5)


def test_gradients_match_dense(inputs):
    hidden, labels, mask, weights = inputs
    ref = jax.grad(lambda h, w: CELoss()(h, labels, mask, w), argnums=(0, 1))(
        hidden, weights
    )
    got = jax.grad(
        lambda h, w: CELossTiled(tile=32)(h, labels, mask, w), argnums=(0, 1)
    )(hidden, weights)
    np.testing.assert_allclose(ref[0], got[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ref[1], got[1], rtol=1e-4, atol=1e-6)


def test_works_under_jit_and_masked_labels(inputs):
    hidden, labels, mask, weights = inputs
    poisoned = jnp.where(mask > 0, labels, N + 7)  # out-of-range padding ids
    loss = jax.jit(lambda h, w: CELossTiled(tile=32)(h, poisoned, mask, w))
    val = loss(hidden, weights)
    ref = CELoss()(hidden, labels, mask, weights)
    np.testing.assert_allclose(val, ref, rtol=1e-5)
