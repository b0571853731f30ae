"""HashDropout: nn.Dropout semantics from a counter-based hash
(replay_tpu/nn/dropout.py — the cheap mask that also drives the fused
attention kernel's in-kernel dropout)."""

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.nn.dropout import HashDropout, hash_keep_mask


def test_deterministic_passthrough():
    x = jnp.ones((4, 8))
    mod = HashDropout(0.5)
    out = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out0 = HashDropout(0.0).apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))


def test_bernoulli_rate_and_scaling():
    x = jnp.ones((256, 512))
    mod = HashDropout(0.3)
    out = np.asarray(
        mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    )
    drop_frac = (out == 0).mean()
    assert abs(drop_frac - 0.3) < 0.01
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.7, rtol=1e-5)
    # expectation preserved
    assert abs(out.mean() - 1.0) < 0.02


def test_same_key_same_mask_different_key_different_mask():
    x = jnp.ones((64, 64))
    mod = HashDropout(0.5)
    a = np.asarray(mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}))
    b = np.asarray(mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}))
    c = np.asarray(mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)}))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_mask_uncorrelated_across_axes():
    """Rows/columns must not share masks (a linear-index hash bug would
    show up as striping)."""
    seed = jnp.int32(1234)
    keep = np.asarray(hash_keep_mask((128, 128), 0.5, seed))
    row_means = keep.mean(axis=1)
    col_means = keep.mean(axis=0)
    assert row_means.std() < 0.1
    assert col_means.std() < 0.1
    # adjacent-element correlation near zero
    flat = keep.astype(np.float64).ravel()
    corr = np.corrcoef(flat[:-1], flat[1:])[0, 1]
    assert abs(corr) < 0.05


def test_gradient_zero_at_dropped_positions():
    x = jnp.ones((32, 32))
    mod = HashDropout(0.4)
    rngs = {"dropout": jax.random.PRNGKey(5)}

    def loss(x):
        return jnp.sum(mod.apply({}, x, deterministic=False, rngs=rngs) ** 2)

    out = np.asarray(mod.apply({}, x, deterministic=False, rngs=rngs))
    g = np.asarray(jax.grad(loss)(x))
    np.testing.assert_array_equal(g == 0, out == 0)
