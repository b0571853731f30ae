"""Interpret-mode parity tests for the fused attention kernel.

The fused kernel (ops/pallas_attention.py) must match the pure-XLA attention
math (the path MultiHeadSelfAttention lowers to) in forward AND backward, and
its in-kernel dropout must be deterministic per key and Bernoulli(1-rate).
Reference hot loop: replay/nn/sequential/sasrec/model.py:85-113.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from replay_tpu.ops.pallas_attention import (
    attention_reference,
    fused_attention,
    fused_attention_packed,
)


def _make_inputs(key, bh, length, hd, dtype=jnp.float32, pad_tail=0):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (bh, length, hd), dtype)
    k = jax.random.normal(kk, (bh, length, hd), dtype)
    v = jax.random.normal(kv, (bh, length, hd), dtype)
    key_bias = np.zeros((bh, length), np.float32)
    if pad_tail:
        # left-padded sequences: first pad_tail key positions masked
        key_bias[:, :pad_tail] = -2.3e38
    return q, k, v, jnp.asarray(key_bias)


def _valid_rows(bias, length, causal, pad_tail):
    """Rows with ≥1 attendable key.  Fully-masked rows (left-padding under a
    causal band) are uniform-softmax garbage in BOTH implementations — never
    consumed downstream (loss + real-query attention both mask them) — and
    differ only by lane count, so parity holds everywhere else."""
    if not causal:
        return np.ones(length, bool)
    return np.arange(length) >= pad_tail


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("length,hd", [(50, 32), (64, 64), (33, 16)])
def test_forward_matches_reference(causal, length, hd):
    q, k, v, bias = _make_inputs(jax.random.PRNGKey(0), 12, length, hd, pad_tail=7)
    scale = 1.0 / np.sqrt(hd)
    got = fused_attention(q, k, v, bias, causal=causal, scale=scale, interpret=True)
    want = attention_reference(q, k, v, bias, causal=causal, scale=scale)
    rows = _valid_rows(bias, length, causal, pad_tail=7)
    np.testing.assert_allclose(
        np.asarray(got)[:, rows], np.asarray(want)[:, rows], atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("causal", [True, False])
def test_backward_matches_reference(causal):
    q, k, v, bias = _make_inputs(jax.random.PRNGKey(1), 8, 50, 32, pad_tail=5)
    scale = 1.0 / np.sqrt(32)
    rows = jnp.asarray(_valid_rows(bias, 50, causal, pad_tail=5), jnp.float32)

    def loss_fused(q, k, v):
        out = fused_attention(q, k, v, bias, causal=causal, scale=scale, interpret=True)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)) * rows[None, :, None])

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, bias, causal=causal, scale=scale)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)) * rows[None, :, None])

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=2e-4)


def test_bf16_forward_close():
    q, k, v, bias = _make_inputs(
        jax.random.PRNGKey(2), 8, 50, 32, dtype=jnp.bfloat16, pad_tail=3
    )
    scale = 1.0 / np.sqrt(32)
    got = fused_attention(q, k, v, bias, causal=True, scale=scale, interpret=True)
    want = attention_reference(q, k, v, bias, causal=True, scale=scale)
    assert got.dtype == jnp.bfloat16
    rows = _valid_rows(bias, 50, True, pad_tail=3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:, rows],
        np.asarray(want, np.float32)[:, rows],
        atol=3e-2,
    )


def test_dropout_deterministic_and_bernoulli():
    q, k, v, bias = _make_inputs(jax.random.PRNGKey(3), 8, 64, 32)
    scale = 1.0 / np.sqrt(32)
    rate = 0.5
    key = jax.random.PRNGKey(7)
    a = fused_attention(
        q, k, v, bias, causal=False, scale=scale,
        dropout_rate=rate, dropout_key=key, interpret=True,
    )
    b = fused_attention(
        q, k, v, bias, causal=False, scale=scale,
        dropout_rate=rate, dropout_key=key, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fused_attention(
        q, k, v, bias, causal=False, scale=scale,
        dropout_rate=rate, dropout_key=jax.random.PRNGKey(8), interpret=True,
    )
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # expectation preserved: mean over many heads ≈ no-dropout mean
    no_drop = fused_attention(q, k, v, bias, causal=False, scale=scale, interpret=True)
    assert abs(float(jnp.mean(a)) - float(jnp.mean(no_drop))) < 0.05


def test_dropout_backward_uses_same_mask():
    """grad through the dropout path must regenerate the forward's mask:
    output positions dropped in fwd contribute exactly zero gradient."""
    q, k, v, bias = _make_inputs(jax.random.PRNGKey(4), 8, 64, 32)
    scale = 1.0 / np.sqrt(32)
    key = jax.random.PRNGKey(11)

    def f(v):
        out = fused_attention(
            q, k, v, bias, causal=False, scale=scale,
            dropout_rate=0.3, dropout_key=key, interpret=True,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # finite-difference check along a random direction: same mask in the
    # re-evaluations (same key) means fd ≈ analytic
    g = jax.grad(f)(v)
    direction = jax.random.normal(jax.random.PRNGKey(12), v.shape, v.dtype)
    eps = 1e-3
    fd = (f(v + eps * direction) - f(v - eps * direction)) / (2 * eps)
    analytic = jnp.sum(g * direction)
    # fd on f32 sums of ~50k terms carries a few % noise; a WRONG mask in
    # the backward (the failure this guards) produces O(30%+) error
    np.testing.assert_allclose(float(fd), float(analytic), rtol=6e-2)


def _pack(x, batch, num_heads):
    """[B·H, L, hd] (h-fastest within batch groups of H) → [B, L, H·hd]."""
    bh, length, hd = x.shape
    return (
        jnp.reshape(x, (batch, num_heads, length, hd))
        .transpose(0, 2, 1, 3)
        .reshape(batch, length, num_heads * hd)
    )


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("num_heads,length,hd", [(2, 50, 32), (4, 33, 16), (1, 64, 64)])
def test_packed_forward_matches_reference(causal, num_heads, length, hd):
    batch = 6
    q, k, v, bias = _make_inputs(
        jax.random.PRNGKey(20), batch * num_heads, length, hd, pad_tail=7
    )
    # bias must be per-BATCH-row constant across heads for the packed form
    bias = jnp.repeat(bias[::num_heads][:batch], num_heads, axis=0)
    scale = 1.0 / np.sqrt(hd)
    got = fused_attention_packed(
        _pack(q, batch, num_heads), _pack(k, batch, num_heads),
        _pack(v, batch, num_heads), bias[::num_heads],
        num_heads=num_heads, causal=causal, scale=scale, interpret=True,
    )
    want = _pack(
        attention_reference(q, k, v, bias, causal=causal, scale=scale),
        batch, num_heads,
    )
    rows = _valid_rows(bias, length, causal, pad_tail=7)
    np.testing.assert_allclose(
        np.asarray(got)[:, rows], np.asarray(want)[:, rows], atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("causal", [True, False])
def test_packed_backward_matches_reference(causal):
    batch, num_heads, length, hd = 4, 2, 50, 32
    q, k, v, bias = _make_inputs(
        jax.random.PRNGKey(21), batch * num_heads, length, hd, pad_tail=5
    )
    scale = 1.0 / np.sqrt(hd)
    rows = jnp.asarray(_valid_rows(bias, length, causal, pad_tail=5), jnp.float32)
    qp, kp, vp = (_pack(t, batch, num_heads) for t in (q, k, v))
    bias_b = bias[::num_heads]

    def loss_packed(q, k, v):
        out = fused_attention_packed(
            q, k, v, bias_b, num_heads=num_heads, causal=causal,
            scale=scale, interpret=True,
        )
        return jnp.sum(jnp.sin(out.astype(jnp.float32)) * rows[None, :, None])

    def loss_ref(q, k, v):
        out = _pack(
            attention_reference(q, k, v, bias, causal=causal, scale=scale),
            batch, num_heads,
        )
        return jnp.sum(jnp.sin(out.astype(jnp.float32)) * rows[None, :, None])

    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(qp, kp, vp)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_packed, g_ref):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(_pack(gr, batch, num_heads)),
            atol=2e-4, rtol=2e-4,
        )


def test_packed_dropout_same_noise_family_as_merged():
    """Same key ⇒ the packed kernel draws bitwise the SAME attention-weight
    dropout mask as the merged-head kernel (idx = ((b·H+h)·L+q)·L+l both)."""
    batch, num_heads, length, hd = 4, 2, 64, 32
    q, k, v, bias = _make_inputs(
        jax.random.PRNGKey(22), batch * num_heads, length, hd
    )
    scale, rate = 1.0 / np.sqrt(hd), 0.4
    key = jax.random.PRNGKey(23)
    merged = fused_attention(
        q, k, v, bias, causal=False, scale=scale,
        dropout_rate=rate, dropout_key=key, interpret=True,
    )
    packed = fused_attention_packed(
        _pack(q, batch, num_heads), _pack(k, batch, num_heads),
        _pack(v, batch, num_heads), bias[::num_heads],
        num_heads=num_heads, causal=False, scale=scale,
        dropout_rate=rate, dropout_key=key, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(packed), np.asarray(_pack(merged, batch, num_heads))
    )


def test_packed_dropout_backward_matches_merged_grads():
    """The packed backward must regenerate the same dropout mask as its
    forward.  The merged-head kernel's fwd/bwd mask agreement is verified
    by finite differences above, and the packed forward is bitwise the
    merged forward for the same key — so packed grads must equal merged
    grads up to layout."""
    batch, num_heads, length, hd = 4, 2, 64, 32
    q, k, v, bias = _make_inputs(
        jax.random.PRNGKey(24), batch * num_heads, length, hd
    )
    qp, kp, vp = (_pack(t, batch, num_heads) for t in (q, k, v))
    key = jax.random.PRNGKey(25)
    kwargs = dict(causal=False, scale=1.0 / np.sqrt(hd),
                  dropout_rate=0.3, dropout_key=key, interpret=True)

    def f_packed(q, k, v):
        out = fused_attention_packed(
            q, k, v, bias[::num_heads], num_heads=num_heads, **kwargs
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def f_merged(q, k, v):
        out = fused_attention(q, k, v, bias, **kwargs)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_packed = jax.grad(f_packed, argnums=(0, 1, 2))(qp, kp, vp)
    g_merged = jax.grad(f_merged, argnums=(0, 1, 2))(q, k, v)
    for gp, gm in zip(g_packed, g_merged):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(_pack(gm, batch, num_heads)),
            atol=1e-5, rtol=1e-5,
        )


def test_packed_supported_routing():
    """Production-shape guard: lp=256 × 4 heads measured a 24.6 MB scoped-
    VMEM stack (> 16 MB limit) — packed must be refused there and allowed
    at the headline shape."""
    from replay_tpu.ops.pallas_attention import packed_supported

    assert packed_supported(64, 2, 2)          # headline: d=64, L=50→64
    assert packed_supported(64, 4, 2)
    assert not packed_supported(256, 4, 2)     # production: d=256, L=200→256
    assert not packed_supported(128, 4, 4)     # f32 halves the budget


def test_auto_head_chunk_routing():
    """Round-5 head-chunked extension: long-L shapes route to a grid head
    chunk when a ≥128-lane chunk fits VMEM (chip-measured: lp=256 hd=128
    chunk=1 compiles and beats merged-head 24%; lp=256 hd=64 chunk=2 is a
    compile-time VMEM OOM → merged-head)."""
    from replay_tpu.ops.pallas_attention import auto_head_chunk

    # headline shape: fully unrolled already fits
    assert auto_head_chunk(64, 2, 32, 2) == (0, 0)
    # lp=256 × H=2 × hd=128: single-head chunk at the forced 8-row block
    assert auto_head_chunk(256, 2, 128, 2) == (1, 8)
    # lp=256 × H=4 × hd=64: chunk=1 is an illegal 64-lane block, chunk=2
    # doubles the live tiles past VMEM → merged-head
    assert auto_head_chunk(256, 4, 64, 2) == (-1, 0)


@pytest.mark.parametrize("chunk", [1, 2])
def test_packed_head_chunk_bitwise_equal(chunk):
    """Chunked grid = unchunked kernel bitwise (fwd, grads, dropout noise)."""
    import jax
    import jax.numpy as jnp

    from replay_tpu.ops.pallas_attention import fused_attention_packed

    b, length, heads, hd = 4, 24, 4, 16
    d = heads * hd
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, length, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, length, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, length, d), jnp.float32)
    bias = jnp.zeros((b, length), jnp.float32)
    dropout_key = jax.random.PRNGKey(11)

    def run(head_chunk):
        def loss(q, k, v):
            out = fused_attention_packed(
                q, k, v, bias, num_heads=heads, causal=True, scale=0.25,
                dropout_rate=0.2, dropout_key=dropout_key, interpret=True,
                head_chunk=head_chunk,
            )
            return jnp.sum(out**2), out

        (val, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                               has_aux=True)(q, k, v)
        return out, grads

    out0, g0 = run(0)
    outc, gc = run(chunk)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(outc))
    for a, bb in zip(g0, gc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_fully_masked_rows_are_finite():
    q, k, v, _ = _make_inputs(jax.random.PRNGKey(5), 8, 16, 32)
    bias = jnp.full((8, 16), -2.3e38, jnp.float32)  # everything masked
    out = fused_attention(q, k, v, bias, causal=True, scale=0.25, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))

    def loss(q):
        return jnp.sum(
            fused_attention(q, k, v, bias, causal=True, scale=0.25, interpret=True)
            .astype(jnp.float32)
        )

    g = jax.grad(loss)(q)
    assert bool(jnp.all(jnp.isfinite(g)))
