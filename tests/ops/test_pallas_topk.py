"""Fused top-k kernel tests (interpret mode on CPU; the real-TPU path is
exercised by bench.py / the driver)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import jax.numpy as jnp
import numpy as np
import pytest

from replay_tpu.ops.pallas_topk import fused_topk, topk_reference

rng = np.random.default_rng(0)


@pytest.mark.parametrize("k", [1, 5, 10])
def test_exact_vs_reference(k):
    q = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1000, 32)).astype(np.float32))
    v1, i1 = fused_topk(q, w, k, block_n=256, interpret=True)
    v2, i2 = topk_reference(q, w, k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ragged_batch_and_catalog():
    """B and N not multiples of the block sizes."""
    q = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(999, 16)).astype(np.float32))
    v1, i1 = fused_topk(q, w, 7, block_n=128, block_b=16, interpret=True)
    v2, i2 = topk_reference(q, w, 7)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_padding_rows_never_returned():
    """Zero-padded catalog rows must not appear even when scores are negative."""
    q = -jnp.ones((4, 8), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(100, 8)).astype(np.float32))
    _, idx = fused_topk(q, w, 10, block_n=64, interpret=True)
    assert int(jnp.max(idx)) < 100
