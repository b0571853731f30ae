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


# ---- budget kernel (large-k with exactness certificate) --------------------

from replay_tpu.ops.pallas_topk import _budget_for, fused_topk_budget


@pytest.mark.parametrize("k", [33, 64, 100, 128, 200])
def test_budget_exact_vs_reference(k):
    q = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4096, 32)).astype(np.float32))
    v1, i1 = fused_topk_budget(q, w, k, block_n=256, interpret=True)
    v2, i2 = topk_reference(q, w, k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    for r in range(8):
        assert set(np.asarray(i1)[r].tolist()) == set(np.asarray(i2)[r].tolist())


def test_budget_ragged_batch_and_catalog():
    q = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3999, 16)).astype(np.float32))
    v1, i1 = fused_topk_budget(q, w, 50, block_n=256, block_b=16, interpret=True)
    v2, i2 = topk_reference(q, w, 50)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    for r in range(37):
        assert set(np.asarray(i1)[r].tolist()) == set(np.asarray(i2)[r].tolist())


def test_budget_adversarial_clustering_falls_back_exactly():
    """All of the global top-k packed into ONE tile (popularity-sorted
    catalog): the per-tile budget overflows, the certificate must trip, and
    the lax.cond fallback must still return the exact answer."""
    d = 8
    q = jnp.ones((4, d), dtype=jnp.float32)
    w = np.zeros((2048, d), dtype=np.float32)
    # 100 best items all inside tile 0 (block_n=256), strictly ordered
    w[:100] = (np.arange(100, 0, -1)[:, None] / d).astype(np.float32)
    w[100:] = -1.0 / d
    v1, i1 = fused_topk_budget(
        jnp.asarray(q), jnp.asarray(w), 100, block_n=256, budget=8, interpret=True
    )
    v2, i2 = topk_reference(q, jnp.asarray(w), 100)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1)[:, :100], np.asarray(i2)[:, :100])


def test_budget_dense_fallback_variant():
    d = 8
    q = jnp.ones((2, d), dtype=jnp.float32)
    w = np.zeros((1024, d), dtype=np.float32)
    w[:64] = (np.arange(64, 0, -1)[:, None] / d).astype(np.float32)
    v1, i1 = fused_topk_budget(
        jnp.asarray(q), jnp.asarray(w), 64, block_n=256, budget=4,
        interpret=True, fallback="dense",
    )
    v2, i2 = topk_reference(q, jnp.asarray(w), 64)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_budget_ties_at_threshold_stay_exact():
    """Many exact ties straddling the k-th value: the certificate must be
    conservative (>= comparison) and the returned values exact."""
    d = 4
    q = jnp.ones((3, d), dtype=jnp.float32)
    w = np.full((1024, d), 0.5 / d, dtype=np.float32)  # every score ties at 0.5
    v1, _ = fused_topk_budget(jnp.asarray(q), jnp.asarray(w), 40, block_n=256,
                              budget=8, interpret=True)
    np.testing.assert_allclose(np.asarray(v1), 0.5, rtol=1e-6)


def test_budget_small_budget_degenerates_to_plain_kernel():
    """grid_n * small → p >= k path must route to the plain kernel."""
    q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    v1, i1 = fused_topk_budget(q, w, 100, block_n=256, interpret=True)
    v2, i2 = topk_reference(q, w, 100)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_budget_for_invariants():
    for k in (33, 100, 512):
        for grid_n in (2, 16, 244):
            p = _budget_for(k, grid_n, None)
            # either the pool covers k, or p >= k signals the plain path
            assert grid_n * p >= k or p >= k
    assert _budget_for(100, 244, 16) == 16
    assert _budget_for(512, 2, None) >= 512  # uncoverable → plain path
