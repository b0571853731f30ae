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


def test_all_negative_final_partial_tile():
    """Padded zero-score rows must not crowd real negative-score items out of
    the per-tile top-k (advisor round-1 high finding): N=129, block_n=128, all
    scores negative, the global best lives in the 1-row partial tile."""
    d = 8
    q = jnp.ones((4, d), dtype=jnp.float32)
    w = np.full((129, d), -1.0 / d, dtype=np.float32)  # every score = -1
    w[128] = -0.1 / d  # item 128 scores -0.1: the global best, in the partial tile
    w = jnp.asarray(w)
    v1, i1 = fused_topk(q, w, 5, block_n=128, interpret=True)
    v2, i2 = topk_reference(q, w, 5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    assert (np.asarray(i1) == 128).any(axis=1).all()
    np.testing.assert_allclose(np.asarray(v1)[:, 0], -0.1, rtol=1e-5)


@pytest.mark.parametrize("k", [33, 64, 100, 128])
def test_bitonic_exact_vs_reference(k):
    q = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2048, 32)).astype(np.float32))
    v1, i1 = fused_topk(q, w, k, block_n=512, interpret=True, method="bitonic")
    v2, i2 = topk_reference(q, w, k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    # indices may permute within exactly-equal scores; values define the set
    for r in range(8):
        assert set(np.asarray(i1)[r].tolist()) == set(np.asarray(i2)[r].tolist())


def test_bitonic_ragged_catalog_all_negative():
    """Ragged final tile + all-negative scores (the round-1 bug shape)."""
    q = jnp.ones((4, 8), dtype=jnp.float32)
    w = np.full((700, 8), -1.0 / 8, dtype=np.float32)
    w[650] = -0.05 / 8
    v1, i1 = fused_topk(jnp.asarray(q), jnp.asarray(w), 40, block_n=256,
                        interpret=True, method="bitonic")
    v2, _ = topk_reference(q, jnp.asarray(w), 40)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    assert (np.asarray(i1) == 650).any(axis=1).all()


def test_bitonic_falls_back_when_unsupported():
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32))
    # k > 128 → silently uses the iterative kernel, still exact
    v1, i1 = fused_topk(q, w, 150, block_n=256, interpret=True, method="bitonic")
    v2, i2 = topk_reference(q, w, 150)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_bitonic_multirow_blocks_and_deep_merge_tree():
    """block_b > 8 sublane rows (the Mosaic lazy-iota-roll crash shape) and
    a 16-segment merge tree in one config."""
    q = jnp.asarray(rng.normal(size=(48, 24)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5000, 24)).astype(np.float32))
    v1, i1 = fused_topk(q, w, 100, block_n=2048, block_b=16, interpret=True,
                        method="bitonic")
    v2, i2 = topk_reference(q, w, 100)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    for r in range(48):
        assert set(np.asarray(i1)[r].tolist()) == set(np.asarray(i2)[r].tolist())
