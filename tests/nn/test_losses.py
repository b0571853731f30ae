"""Loss correctness: finiteness, gradients, and analytic reference values."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from replay_tpu.nn.losses import (
    BCELoss,
    BPRLoss,
    BCESampledLoss,
    CELoss,
    CESampledLoss,
    LogInCELoss,
    LogOutCELoss,
    ScalableCELoss,
)

B, L, D, N = 4, 6, 8, 30


@pytest.fixture()
def inputs():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = jax.random.normal(k1, (B, L, D))
    labels = jax.random.randint(k2, (B, L), 0, N)
    mask = (jax.random.uniform(k3, (B, L)) > 0.3).astype(jnp.float32)
    weights = jax.random.normal(key, (N, D)) * 0.1
    return hidden, labels, mask, weights


ALL_LOSSES = [
    BPRLoss(2),
    CELoss(),
    CESampledLoss(8),
    BCELoss(),
    BCESampledLoss(2),
    LogInCELoss(),
    ScalableCELoss(4, 8, 8),
]


@pytest.mark.parametrize("loss", ALL_LOSSES, ids=lambda l: type(l).__name__)
def test_loss_finite_and_grads(loss, inputs):
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(1)
    val = loss(hidden, labels, mask, weights, key=key)
    assert jnp.isfinite(val)
    grads = jax.grad(lambda h, w: loss(h, labels, mask, w, key=key), argnums=(0, 1))(
        hidden, weights
    )
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))


def test_loss_ignores_masked_positions(inputs):
    """Changing labels at masked positions must not change the loss."""
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(1)
    # poison masked labels with the out-of-range padding id
    poisoned = jnp.where(mask > 0, labels, N + 5)
    for loss in ALL_LOSSES:
        a = loss(hidden, labels, mask, weights, key=key)
        b = loss(hidden, poisoned, mask, weights, key=key)
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_ce_matches_manual():
    hidden = jnp.ones((1, 1, 2))
    weights = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    labels = jnp.array([[2]])
    mask = jnp.ones((1, 1))
    got = CELoss()(hidden, labels, mask, weights)
    logits = np.array([1.0, 1.0, 2.0])
    expected = -(logits[2] - np.log(np.exp(logits).sum()))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_ce_sampled_approaches_full_ce(inputs):
    """With ALL items as negatives + collision masking, sampled CE ≈ CE
    up to the collision correction; just check they are correlated."""
    hidden, labels, mask, weights = inputs
    full = CELoss()(hidden, labels, mask, weights)
    approx = np.mean(
        [
            CESampledLoss(28)(hidden, labels, mask, weights, key=jax.random.PRNGKey(i))
            for i in range(16)
        ]
    )
    # sampled estimate is below full-CE (fewer negatives) but same order
    assert 0.3 * float(full) < approx < 1.2 * float(full)


def test_logout_requires_negatives(inputs):
    hidden, labels, mask, weights = inputs
    with pytest.raises(ValueError):
        LogOutCELoss()(hidden, labels, mask, weights)
    val = LogOutCELoss()(
        hidden, labels, mask, weights, negatives=jnp.arange(10), key=jax.random.PRNGKey(0)
    )
    assert jnp.isfinite(val)


def test_losses_decrease_under_sgd(inputs):
    """A few gradient steps on item weights must reduce each loss."""
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(3)
    for loss in [CELoss(), BCELoss(), LogInCELoss()]:
        w = weights
        f = lambda w_: loss(hidden, labels, mask, w_, key=key)  # noqa: E731
        before = f(w)
        for _ in range(20):
            w = w - 0.5 * jax.grad(f)(w)
        assert f(w) < before


def test_weighted_ce_variants(inputs):
    from replay_tpu.nn.losses import CESampledWeightedLoss, CEWeightedLoss

    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(0)
    uniform = jnp.ones_like(mask)
    # uniform weights == unweighted loss
    np.testing.assert_allclose(
        CEWeightedLoss()(hidden, labels, mask, weights, sample_weights=uniform),
        CELoss()(hidden, labels, mask, weights),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        CESampledWeightedLoss(8)(hidden, labels, mask, weights,
                                 sample_weights=uniform, key=key),
        CESampledLoss(8)(hidden, labels, mask, weights, key=key),
        rtol=1e-6,
    )
    # non-uniform weights change the value
    ramp = jnp.linspace(0.1, 1.0, mask.shape[1])[None, :].repeat(mask.shape[0], 0)
    weighted = CEWeightedLoss()(hidden, labels, mask, weights, sample_weights=ramp)
    assert not np.isclose(float(weighted), float(CELoss()(hidden, labels, mask, weights)))


def test_sce_padding_does_not_crowd_buckets(inputs):
    """Garbage hidden states at padded positions must not occupy bucket_size_x
    slots (reference sce.py:82 masks x_bucket before top-k): the loss must be
    identical whether padded positions hold zeros or huge-norm garbage."""
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(7)
    loss = ScalableCELoss(4, 8, 8)
    garbage = jnp.where(mask[..., None] > 0, hidden, 1e3)
    zeroed = jnp.where(mask[..., None] > 0, hidden, 0.0)
    np.testing.assert_allclose(
        loss(garbage, labels, mask, weights, key=key),
        loss(zeroed, labels, mask, weights, key=key),
        rtol=1e-6,
    )


def test_sce_fully_padded_rows_do_not_dilute(inputs):
    """Appending all-padding rows must leave SCE unchanged: they may neither
    enter buckets nor count in the mean denominator (reference sce.py:121
    drops loss==0 and masked entries)."""
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(11)
    loss = ScalableCELoss(4, 8, 8)
    base = loss(hidden, labels, mask, weights, key=key)
    pad_h = jnp.concatenate([hidden, jnp.full((2, L, D), 50.0)], axis=0)
    pad_labels = jnp.concatenate([labels, jnp.zeros((2, L), jnp.int32)], axis=0)
    pad_mask = jnp.concatenate([mask, jnp.zeros((2, L), mask.dtype)], axis=0)
    diluted = loss(pad_h, pad_labels, pad_mask, weights, key=key)
    np.testing.assert_allclose(base, diluted, rtol=1e-6)


def test_sce_mix_x_variant(inputs):
    """mix_x builds data-dependent bucket directions (reference sce.py:71-74);
    it must run, differ from the fixed-projection variant, and be finite
    under grad."""
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(5)
    plain = ScalableCELoss(4, 8, 8, mix_x=False)(hidden, labels, mask, weights, key=key)
    mixed_loss = ScalableCELoss(4, 8, 8, mix_x=True)
    mixed = mixed_loss(hidden, labels, mask, weights, key=key)
    assert jnp.isfinite(mixed)
    assert not np.isclose(float(plain), float(mixed))
    g = jax.grad(lambda h: mixed_loss(h, labels, mask, weights, key=key))(hidden)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_bpr_prefers_positive(inputs):
    """BPR of a model that scores positives higher must beat a random one."""
    hidden, labels, mask, weights = inputs
    key = jax.random.PRNGKey(1)
    # construct hidden = positive item embedding → pos scores maximal
    aligned = jnp.take(weights, jnp.where(mask > 0, labels, 0), axis=0) * 10
    good = BPRLoss(4)(aligned, labels, mask, weights, key=key)
    bad = BPRLoss(4)(hidden, labels, mask, weights, key=key)
    assert float(good) < float(bad)
