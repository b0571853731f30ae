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


def test_bf16_compute_matches_bf16_dense():
    """bf16-GEMM tiled CE must agree with a dense CE computed from the SAME
    bf16 inputs (f32 accumulation both sides) — the throughput mode for the
    1M-catalog training path."""
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    B, L, D, N = 3, 5, 16, 200
    hidden = jax.random.normal(k1, (B, L, D))
    labels = jax.random.randint(k2, (B, L), 0, N)
    mask = jnp.ones((B, L))
    weights = jax.random.normal(k3, (N, D)) * 0.2

    def dense_bf16(h, w):
        logits = jnp.dot(
            h.astype(jnp.bfloat16).reshape(-1, D),
            w.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels.reshape(-1)[:, None], axis=-1)[:, 0]
        return jnp.mean(nll)

    tiled = CELossTiled(tile=64, compute_dtype="bfloat16")
    loss_t = tiled(hidden, labels, mask, weights)
    loss_d = dense_bf16(hidden, weights)
    np.testing.assert_allclose(float(loss_t), float(loss_d), rtol=1e-5)

    # backward runs its GEMMs with the probs*g operand rounded to bf16 (the
    # MXU speed trade); dense autodiff keeps it f32 — tolerance reflects one
    # bf16 rounding step
    gt = jax.grad(lambda h, w: tiled(h, labels, mask, w), argnums=(0, 1))(hidden, weights)
    gd = jax.grad(dense_bf16, argnums=(0, 1))(hidden, weights)
    np.testing.assert_allclose(np.asarray(gt[0]), np.asarray(gd[0]).reshape(B, L, D), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gt[1]), np.asarray(gd[1]), atol=1e-3)


class TestFlashCE:
    """Pallas flash-CE (interpret mode on CPU) vs dense CE."""

    def test_loss_matches_dense(self, inputs):
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll

        hidden, labels, mask, weights = inputs
        dense = CELoss()(hidden, labels, mask, weights)
        nll = flash_ce_nll(
            hidden, _safe_labels(labels, mask), weights, 8, 128, None, True
        )
        np.testing.assert_allclose(dense, _masked_mean(nll, mask), rtol=1e-5)

    def test_gradients_match_dense(self, inputs):
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll

        hidden, labels, mask, weights = inputs

        def flash_loss(h, w):
            nll = flash_ce_nll(
                h, _safe_labels(labels, mask), w, 8, 128, None, True
            )
            return _masked_mean(nll, mask)

        ref = jax.grad(
            lambda h, w: CELoss()(h, labels, mask, w), argnums=(0, 1)
        )(hidden, weights)
        got = jax.grad(flash_loss, argnums=(0, 1))(hidden, weights)
        np.testing.assert_allclose(ref[0], got[0], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ref[1], got[1], rtol=1e-4, atol=1e-6)

    def test_ragged_shapes_and_bf16(self, inputs):
        """Non-multiple M and N exercise both padding paths; bf16 compute
        stays within mixed-precision tolerance."""
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll

        hidden, labels, mask, weights = inputs
        h = hidden[:3, :5]
        lab = _safe_labels(labels[:3, :5], mask[:3, :5])
        w = weights[:77]
        lab = jnp.minimum(lab, 76)
        dense = CELoss()(h, lab, mask[:3, :5], w)
        nll = flash_ce_nll(h, lab, w, 8, 128, None, True)
        np.testing.assert_allclose(
            dense, _masked_mean(nll, mask[:3, :5]), rtol=1e-5
        )
        nll_bf16 = flash_ce_nll(h, lab, w, 8, 128, jnp.bfloat16, True)
        np.testing.assert_allclose(
            dense, _masked_mean(nll_bf16, mask[:3, :5]), rtol=0.05
        )

    def test_tiny_m_and_block_oversize(self, inputs):
        """block_m larger than M and N smaller than one lane tile."""
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll

        hidden, labels, mask, weights = inputs
        h = hidden[:1, :2]          # M = 2 rows
        lab = jnp.minimum(_safe_labels(labels[:1, :2], mask[:1, :2]), 49)
        w = weights[:50]            # N = 50 < 128 lanes
        dense = CELoss()(h, lab, mask[:1, :2], w)
        nll = flash_ce_nll(h, lab, w, 512, 2048, None, True)
        np.testing.assert_allclose(
            dense, _masked_mean(nll, mask[:1, :2]), rtol=1e-5
        )

    def test_mixed_dtype_hidden(self, inputs):
        """bf16 activations x f32 weights — the trainer's standard mix."""
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll

        hidden, labels, mask, weights = inputs
        h16 = hidden.astype(jnp.bfloat16)
        dense = CELoss()(h16, labels, mask, weights)
        nll = flash_ce_nll(h16, _safe_labels(labels, mask), weights, 8, 128, None, True)
        np.testing.assert_allclose(
            dense, _masked_mean(nll, mask), rtol=2e-2
        )
        # grads flow and keep the input dtypes
        import jax as _jax
        g = _jax.grad(lambda h, w: _masked_mean(
            flash_ce_nll(h, _safe_labels(labels, mask), w, 8, 128, None, True), mask
        ), argnums=(0, 1))(h16, weights)
        assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.float32
        assert np.isfinite(np.asarray(g[1], dtype=np.float32)).all()


class TestFlashBackwardPaths:
    """Both backward schedules must match dense grads: the combined
    single-recompute kernel with materialized partials (n_steps <= 4) and
    the scan-driven per-n-block variant (large catalogs, round 5)."""

    def _grads(self, n_items, block_n):
        from replay_tpu.nn.losses import CELoss
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll

        rng = jax.random.PRNGKey(3)
        B, L, D = 3, 4, 16
        hidden = jax.random.normal(rng, (B, L, D), jnp.float32)
        weights = jax.random.normal(jax.random.PRNGKey(4), (n_items, D), jnp.float32)
        labels = jax.random.randint(rng, (B, L), 0, n_items)
        mask = jnp.ones((B, L), jnp.int8)

        def flash_loss(h, w):
            nll = flash_ce_nll(
                h, _safe_labels(labels, mask), w, 8, block_n, None, True
            )
            return _masked_mean(nll, mask)

        ref = jax.grad(
            lambda h, w: CELoss()(h, labels, mask, w), argnums=(0, 1)
        )(hidden, weights)
        got = jax.grad(flash_loss, argnums=(0, 1))(hidden, weights)
        return ref, got

    @pytest.mark.parametrize(
        "n_items,block_n",
        [(200, 128), (900, 128)],  # n_steps 2 (materialized) and 8 (scan)
        ids=["combined_kernel", "scan_kernel"],
    )
    def test_both_paths_match_dense(self, n_items, block_n):
        ref, got = self._grads(n_items, block_n)
        np.testing.assert_allclose(ref[0], got[0], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ref[1], got[1], rtol=1e-4, atol=1e-6)


class TestEagerFlashCE:
    """One-pass eager-grad CE (flash_ce_mean, interpret mode on CPU): exact
    same scalar and gradients as the dense/masked-mean formulation."""

    def _mean(self, hidden, labels, mask, weights, **kw):
        from replay_tpu.nn.tiled_ce import flash_ce_mean
        from replay_tpu.nn.losses import _safe_labels

        return flash_ce_mean(
            hidden, _safe_labels(labels, mask), mask, weights,
            kw.get("block_m", 16), kw.get("compute_dtype"), True,
        )

    def test_loss_matches_dense(self, inputs):
        hidden, labels, mask, weights = inputs
        dense = CELoss()(hidden, labels, mask, weights)
        got = self._mean(hidden, labels, mask, weights)
        np.testing.assert_allclose(dense, got, rtol=1e-5)

    def test_gradients_match_dense(self, inputs):
        hidden, labels, mask, weights = inputs
        ref = jax.grad(
            lambda h, w: CELoss()(h, labels, mask, w), argnums=(0, 1)
        )(hidden, weights)
        got = jax.grad(
            lambda h, w: self._mean(h, labels, mask, w), argnums=(0, 1)
        )(hidden, weights)
        np.testing.assert_allclose(ref[0], got[0], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ref[1], got[1], rtol=1e-4, atol=1e-6)

    def test_scalar_cotangent_scales_grads(self, inputs):
        """The backward only scales saved grads — any scalar upstream
        factor (loss combinations, lr-scaled losses) must flow exactly."""
        hidden, labels, mask, weights = inputs
        g1 = jax.grad(lambda h: self._mean(h, labels, mask, weights))(hidden)
        g3 = jax.grad(
            lambda h: 3.0 * self._mean(h, labels, mask, weights)
        )(hidden)
        np.testing.assert_allclose(np.asarray(g3), 3.0 * np.asarray(g1),
                                   rtol=1e-5, atol=1e-7)

    def test_duplicate_labels_and_poisoned_padding(self, inputs):
        hidden, _, mask, weights = inputs
        labels = jnp.zeros((B, L), jnp.int32)  # every row the same label
        poisoned = jnp.where(mask > 0, labels, N + 7)
        ref = jax.grad(
            lambda w: CELoss()(hidden, labels, mask, w)
        )(weights)
        got = jax.grad(
            lambda w: self._mean(hidden, poisoned, mask, w)
        )(weights)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-6)

    def test_all_masked_is_finite(self, inputs):
        hidden, labels, _, weights = inputs
        mask = jnp.zeros((B, L), jnp.float32)
        val, grad = jax.value_and_grad(
            lambda h: self._mean(h, labels, mask, weights)
        )(hidden)
        assert np.isfinite(float(val))
        assert bool(jnp.all(jnp.isfinite(grad)))

    def test_dispatched_from_celosstiled(self, inputs):
        """Drive CELossTiled's REAL flash->eager dispatch branch (via the
        interpret hook) — value AND grads must match the scan path, so a
        mis-wired argument in the dispatch call cannot stay green."""
        hidden, labels, mask, weights = inputs
        from replay_tpu.ops.pallas_ce import eager_ce_supported

        assert eager_ce_supported(N, D)
        assert not eager_ce_supported(2_000_000, 64)
        flash = CELossTiled(tile=32, impl="flash")
        flash._interpret = True
        scan_v, scan_g = jax.value_and_grad(
            lambda h, w: CELossTiled(tile=32, impl="scan")(h, labels, mask, w),
            argnums=(0, 1),
        )(hidden, weights)
        got_v, got_g = jax.value_and_grad(
            lambda h, w: flash(h, labels, mask, w), argnums=(0, 1)
        )(hidden, weights)
        np.testing.assert_allclose(scan_v, got_v, rtol=1e-5)
        for a, b in zip(scan_g, got_g):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
        # value-only call (primal path, no grad work) agrees bitwise with
        # the differentiated forward's value
        np.testing.assert_array_equal(
            np.asarray(flash(hidden, labels, mask, weights)),
            np.asarray(got_v),
        )

    def test_bf16_compute_close(self, inputs):
        hidden, labels, mask, weights = inputs
        f32 = self._mean(hidden, labels, mask, weights)
        bf16 = self._mean(hidden, labels, mask, weights,
                          compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(float(f32), float(bf16), rtol=2e-2)


class TestMaxFreeForward:
    """Round-5 max-free flash forward: GEMM-rate lse for large catalogs
    with a finiteness certificate → exact shifted-kernel fallback."""

    def _mk(self, scale=0.05, m=24, n=640, d=16, seed=0):
        h = jax.random.normal(jax.random.PRNGKey(seed), (m, d), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, d)) * scale
        return h, w

    def test_maxfree_matches_shifted(self, monkeypatch):
        from replay_tpu.ops import pallas_ce

        h, w = self._mk()
        ref = pallas_ce.flash_lse(h, w, block_m=8, block_n=128, interpret=True)
        monkeypatch.setattr(pallas_ce, "MAXFREE_MIN_N", 1)
        jax.clear_caches()  # flash_lse is jitted; the threshold is trace-time
        got = pallas_ce.flash_lse(h, w, block_m=8, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        jax.clear_caches()

    def test_overflow_certificate_falls_back(self, monkeypatch):
        """Logits past f32's exp range overflow the max-free sum; the
        certificate must flip to the shifted kernel, whose result is
        finite and exact."""
        from replay_tpu.ops import pallas_ce

        h, w = self._mk(scale=50.0)  # logits ~ O(1000) >> 88
        ref = pallas_ce.flash_lse(h, w, block_m=8, block_n=128, interpret=True)
        assert np.isfinite(np.asarray(ref)).all()
        monkeypatch.setattr(pallas_ce, "MAXFREE_MIN_N", 1)
        jax.clear_caches()
        got = pallas_ce.flash_lse(h, w, block_m=8, block_n=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        jax.clear_caches()

    def test_grads_still_match_dense_with_maxfree(self, monkeypatch):
        from replay_tpu.nn.losses import CELoss
        from replay_tpu.nn.tiled_ce import _masked_mean, _safe_labels, flash_ce_nll
        from replay_tpu.ops import pallas_ce

        monkeypatch.setattr(pallas_ce, "MAXFREE_MIN_N", 1)
        jax.clear_caches()
        rng = jax.random.PRNGKey(3)
        B, L, D, n = 3, 4, 16, 900
        hidden = jax.random.normal(rng, (B, L, D), jnp.float32)
        weights = jax.random.normal(jax.random.PRNGKey(4), (n, D)) * 0.1
        labels = jax.random.randint(rng, (B, L), 0, n)
        mask = jnp.ones((B, L), jnp.int8)

        def flash_loss(h, w):
            nll = flash_ce_nll(h, _safe_labels(labels, mask), w, 8, 128, None, True)
            return _masked_mean(nll, mask)

        ref = jax.grad(lambda h, w: CELoss()(h, labels, mask, w), argnums=(0, 1))(
            hidden, weights)
        got = jax.grad(flash_loss, argnums=(0, 1))(hidden, weights)
        np.testing.assert_allclose(ref[0], got[0], rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(ref[1], got[1], rtol=3e-4, atol=1e-5)
        jax.clear_caches()  # traces compiled under the patched threshold
