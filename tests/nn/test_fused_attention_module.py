"""MultiHeadSelfAttention fused-kernel routing: forced-fused (interpret mode)
must match the XLA einsum path on identical params, through the full SasRec
encoder too.  Reference hot loop: replay/nn/sequential/sasrec/model.py:85-113.
"""

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.nn.attention import (
    AttentionBiasParts,
    MultiHeadSelfAttention,
    build_attention_bias_parts,
)


def _padding_mask(batch, length, lengths):
    # left-padded: last `n` positions real
    pos = np.arange(length)[None, :]
    return jnp.asarray((pos >= (length - np.asarray(lengths)[:, None])).astype(np.int32))


def test_bias_parts_carry_causal_flag():
    pm = _padding_mask(3, 8, [8, 5, 1])
    parts = build_attention_bias_parts(pm, causal=True)
    assert isinstance(parts, AttentionBiasParts)
    assert parts.causal is True
    assert build_attention_bias_parts(pm, causal=False).causal is False


def _run(module_kwargs, x, bias, params=None, rngs=None):
    mod = MultiHeadSelfAttention(**module_kwargs)
    if params is None:
        params = mod.init(jax.random.PRNGKey(0), x, bias)["params"]
    out = mod.apply({"params": params}, x, bias, rngs=rngs)
    return params, out


def test_fused_matches_xla_path():
    batch, length, dim = 4, 50, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, length, dim), jnp.float32)
    pm = _padding_mask(batch, length, [50, 30, 10, 1])
    for causal in (True, False):
        bias = build_attention_bias_parts(pm, causal=causal)
        params, ref = _run({"num_heads": 2, "fused": False, "dtype": jnp.float32}, x, bias)
        _, got = _run(
            {"num_heads": 2, "fused": True, "dtype": jnp.float32}, x, bias, params=params
        )
        # compare only rows every implementation defines (≥1 attendable key)
        real = np.asarray(pm).astype(bool) if causal else np.ones((batch, length), bool)
        np.testing.assert_allclose(
            np.asarray(got)[real], np.asarray(ref)[real], atol=2e-5, rtol=2e-5
        )


def test_fused_kang_variant_cross_stream():
    batch, length, dim = 4, 33, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, length, dim), jnp.float32)
    kv = jax.random.normal(jax.random.PRNGKey(3), (batch, length, dim), jnp.float32)
    pm = _padding_mask(batch, length, [33, 20, 5, 2])
    bias = build_attention_bias_parts(pm, causal=True)
    mod_ref = MultiHeadSelfAttention(num_heads=4, fused=False, dtype=jnp.float32)
    params = mod_ref.init(jax.random.PRNGKey(0), x, bias, kv=kv)["params"]
    ref = mod_ref.apply({"params": params}, x, bias, kv=kv)
    got = MultiHeadSelfAttention(num_heads=4, fused=True, dtype=jnp.float32).apply(
        {"params": params}, x, bias, kv=kv
    )
    real = np.asarray(pm).astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(ref)[real], atol=2e-5, rtol=2e-5
    )


def test_dense_bias_falls_back_to_xla():
    """External callers passing a dense [B,1,L,L] bias must keep working —
    the fused flag silently falls back (the kernel needs the parts form)."""
    batch, length, dim = 2, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(4), (batch, length, dim), jnp.float32)
    dense_bias = jnp.zeros((batch, 1, length, length), jnp.float32)
    mod = MultiHeadSelfAttention(num_heads=2, fused=True, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, dense_bias)["params"]
    out = mod.apply({"params": params}, x, dense_bias)
    assert out.shape == (batch, length, dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fused_gradients_match_xla_path():
    batch, length, dim = 4, 50, 64
    x = jax.random.normal(jax.random.PRNGKey(5), (batch, length, dim), jnp.float32)
    pm = _padding_mask(batch, length, [50, 30, 10, 2])
    bias = build_attention_bias_parts(pm, causal=True)
    rows = jnp.asarray(np.asarray(pm), jnp.float32)[:, :, None]

    mod_ref = MultiHeadSelfAttention(num_heads=2, fused=False, dtype=jnp.float32)
    params = mod_ref.init(jax.random.PRNGKey(0), x, bias)["params"]

    def loss(params, mod):
        out = mod.apply({"params": params}, x, bias)
        return jnp.sum((out.astype(jnp.float32) * rows) ** 2)

    g_ref = jax.grad(loss)(params, mod_ref)
    g_fused = jax.grad(loss)(
        params, MultiHeadSelfAttention(num_heads=2, fused=True, dtype=jnp.float32)
    )
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_fused, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_fused_dropout_trains_deterministically():
    batch, length, dim = 4, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(6), (batch, length, dim), jnp.float32)
    pm = _padding_mask(batch, length, [16, 10, 4, 1])
    bias = build_attention_bias_parts(pm, causal=True)
    mod = MultiHeadSelfAttention(num_heads=2, fused=True, dropout_rate=0.3, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, bias)["params"]
    rngs = {"dropout": jax.random.PRNGKey(9)}
    a = mod.apply({"params": params}, x, bias, deterministic=False, rngs=rngs)
    b = mod.apply({"params": params}, x, bias, deterministic=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = mod.apply(
        {"params": params}, x, bias, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(10)},
    )
    assert not np.allclose(np.asarray(a), np.asarray(c))
