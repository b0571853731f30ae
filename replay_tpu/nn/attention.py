"""Multi-head self-attention for sequence encoders.

TPU-native analog of the reference attention stack (reference:
replay/nn/attention.py:7 MultiHeadDifferentialAttention and torch
nn.MultiheadAttention used in replay/nn/sequential/sasrec/transformer.py:10).

Implementation notes:
- einsum formulation, bf16 operands with float32 softmax accumulation —
  this is the shape XLA pattern-matches into its fused attention path;
- masks are additive float biases built once per batch from the padding
  mask (+ causal band for SasRec / full band for Bert4Rec), matching the
  reference's ``DefaultAttentionMask`` (replay/nn/mask.py:58);
- sequence lengths in recsys are ≤ a few hundred, so a flash-style Pallas
  attention buys nothing here — the whole [B,H,L,L] score tensor fits VMEM
  per block and XLA's fusion is at speed-of-light; Pallas effort goes to the
  full-catalog scoring kernels instead (replay_tpu/ops).
"""

import os
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype
from replay_tpu.nn.dropout import HashDropout

NEG_INF = -1e9


class AttentionBiasParts(NamedTuple):
    """Broadcastable attention-bias factors plus the static causality flag.

    Carrying ``causal`` lets :class:`MultiHeadSelfAttention` route to the
    fused Pallas kernel (ops/pallas_attention.py), which rebuilds the causal
    band from iotas in-kernel instead of reading a [L, L] bias tensor.
    """

    key_bias: jnp.ndarray  # [B, 1, 1, L] additive f32
    band_bias: Optional[jnp.ndarray]  # [1, 1, L, L] | None
    causal: bool


def build_attention_bias(
    padding_mask: jnp.ndarray,
    causal: bool,
) -> jnp.ndarray:
    """[B, L] int/bool padding mask (1 = real) → [B, 1, L, L] additive bias.

    Reference semantics (replay/nn/mask.py:58): key positions that are
    padding are unattendable; with ``causal`` the upper triangle is also
    masked (SasRec), without it only padding is masked (Bert4Rec).

    Internal model code prefers :func:`build_attention_bias_parts`, which
    keeps the bias as two SMALL broadcastable tensors instead of this dense
    [B, 1, L, L] buffer (82 MB at batch 4096 · L 50) — the dense form stays
    for external callers that index or inspect the mask.
    """
    key_bias, band_bias, _ = build_attention_bias_parts(padding_mask, causal)
    batch, length = padding_mask.shape
    bias = jnp.broadcast_to(key_bias, (batch, 1, length, length))
    if band_bias is not None:
        bias = bias + band_bias
    return jnp.maximum(bias, NEG_INF)


def build_attention_bias_parts(padding_mask: jnp.ndarray, causal: bool):
    """Additive attention bias as fusable broadcast parts.

    Returns ``(key_bias [B,1,1,L], band_bias [1,1,L,L] | None)`` whose SUM
    equals :func:`build_attention_bias`'s dense tensor.  Adding the parts to
    the score tensor lets XLA fuse the broadcasts into the softmax input —
    no [B, 1, L, L] intermediate ever reaches HBM (round-3 step bisect:
    the dense bias + f32 score traffic was a measurable slice of the
    attention time at batch 4096).
    """
    length = padding_mask.shape[-1]
    key_bias = jnp.where(padding_mask.astype(jnp.bool_), 0.0, NEG_INF).astype(
        jnp.float32
    )[:, None, None, :]
    band_bias = None
    if causal:
        band = jnp.tril(jnp.ones((length, length), dtype=jnp.bool_))
        band_bias = jnp.where(band, 0.0, NEG_INF).astype(jnp.float32)[None, None]
    return AttentionBiasParts(key_bias, band_bias, causal)


def apply_attention_bias(scores: jnp.ndarray, attn_bias) -> jnp.ndarray:
    """Add a bias to [..., L, L] scores; accepts the dense [B,1,L,L] form or
    the ``(key_bias, band_bias)`` parts tuple."""
    if attn_bias is None:
        return scores
    if isinstance(attn_bias, tuple):
        key_bias, band_bias = attn_bias[0], attn_bias[1]
        scores = scores + key_bias
        if band_bias is not None:
            scores = scores + band_bias
        return scores
    return scores + attn_bias


class MultiHeadSelfAttention(nn.Module):
    """Standard MHA over [B, L, D] with additive attention bias.

    ``fused=None`` (auto) routes the attention core through the fused Pallas
    kernel (ops/pallas_attention.py: scores→bias→softmax→dropout→PV in one
    VMEM-resident pass) on TPU whenever ``attn_bias`` is the
    :class:`AttentionBiasParts` form the models build — the kernel needs the
    static ``causal`` flag plus the [B, L] key bias, not a dense [B,1,L,L]
    tensor.  ``fused=False`` forces the XLA einsum path; ``fused=True``
    forces the kernel (interpreted off-TPU — for parity tests).
    """

    num_heads: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None
    fused: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``kv`` lets queries and keys/values come from different streams —
        the Kang SASRec block normalizes only the query
        (reference: replay/nn/sequential/sasrec/transformer.py:98)."""
        batch, length, dim = x.shape
        head_dim = dim // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(self.num_heads, head_dim),
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            name=name,
        )
        src = x if kv is None else kv
        q = dense("query")(x)
        k = dense("key")(src)
        v = dense("value")(src)

        kv_len = src.shape[1]
        fusable = isinstance(attn_bias, AttentionBiasParts) and kv_len == length
        flag = self.fused
        if flag is None:
            # operator override: REPLAY_TPU_FUSED_ATTENTION=1 forces the
            # kernel (interpreted off-TPU), =0 is the kill switch
            env = os.environ.get("REPLAY_TPU_FUSED_ATTENTION")
            if env is not None:
                lowered = env.strip().lower()
                if lowered in ("1", "true", "on", "yes"):
                    flag = True
                elif lowered in ("0", "false", "off", "no", ""):
                    flag = False
                else:  # typo: warn and fall through to the auto heuristic
                    import warnings

                    warnings.warn(
                        f"REPLAY_TPU_FUSED_ATTENTION={env!r} not understood "
                        "(use 1/0); ignoring",
                        stacklevel=2,
                    )
        use_fused = (
            fusable
            if flag
            else (
                flag is None
                and fusable
                # single-device only: pallas_call has no SPMD partitioning
                # rule, so under a multi-chip mesh the auto path stays on
                # the einsum form (which GSPMD shards cleanly); forcing
                # fused=True remains available for shard_map callers
                and jax.default_backend() == "tpu"
                and jax.device_count() == 1
            )
        )
        if use_fused:
            from replay_tpu.ops.pallas_attention import (
                _round_up,
                auto_head_chunk,
                fused_attention,
                fused_attention_packed,
            )

            rate = 0.0 if deterministic else self.dropout_rate
            dropout_key = self.make_rng("dropout") if rate > 0.0 else None
            scale = 1.0 / float(head_dim) ** 0.5
            interpret = jax.default_backend() != "tpu"
            key_bias = attn_bias.key_bias.reshape(batch, kv_len)
            chunk, blk_rows = auto_head_chunk(
                _round_up(length, 64), self.num_heads, head_dim,
                q.dtype.itemsize,
            )
            if chunk >= 0:
                # PACKED layout: the [B,L,H,hd]→[B,L,D] reshape is
                # layout-free (features are h-major), so q/k/v/o reach the
                # kernel with ZERO transposes — heads are sliced off the
                # lane axis in-kernel (headline bench 122.9k→156.6k ex/s).
                # chunk > 0 puts heads on the grid for long-L shapes that
                # can't hold every head's score tile at once (round 5).
                hd_total = self.num_heads * head_dim  # == dim when divisible
                out = fused_attention_packed(
                    q.reshape(batch, length, hd_total),
                    k.reshape(batch, kv_len, hd_total),
                    v.reshape(batch, kv_len, hd_total),
                    key_bias,
                    num_heads=self.num_heads,
                    causal=attn_bias.causal,
                    scale=scale,
                    dropout_rate=rate,
                    dropout_key=dropout_key,
                    interpret=interpret,
                    block_rows=blk_rows,
                    head_chunk=chunk,
                )
                out = out.reshape(batch, length, self.num_heads, head_dim)
            else:
                # long-L × many-heads at hd<128: even per-head chunks can't
                # make a legal ≥128-lane block that fits scoped VMEM;
                # merged-head blocks stay small and the transpose cost is
                # noise next to the d≥256 GEMMs
                bh = batch * self.num_heads
                out = fused_attention(
                    q.transpose(0, 2, 1, 3).reshape(bh, length, head_dim),
                    k.transpose(0, 2, 1, 3).reshape(bh, kv_len, head_dim),
                    v.transpose(0, 2, 1, 3).reshape(bh, kv_len, head_dim),
                    jnp.repeat(key_bias, self.num_heads, axis=0),
                    causal=attn_bias.causal,
                    scale=scale,
                    dropout_rate=rate,
                    dropout_key=dropout_key,
                    interpret=interpret,
                )
                out = out.reshape(batch, self.num_heads, length, head_dim).transpose(
                    0, 2, 1, 3
                )
            return nn.DenseGeneral(
                features=dim,
                axis=(-2, -1),
                dtype=resolve_dtype(self.dtype),
                param_dtype=jnp.float32,
                name="out",
            )(out)

        # heads merged into the batch dim: [(B·H), L, hd] batched GEMMs beat
        # the 4-D "bqhd,bkhd->bhqk" lowering by ~20% at hd=32 on TPU
        # (PERF.md round-3 attention ablation); reshapes are layout-free
        bh = batch * self.num_heads
        qm = q.transpose(0, 2, 1, 3).reshape(bh, length, head_dim)
        km = k.transpose(0, 2, 1, 3).reshape(bh, kv_len, head_dim)
        vm = v.transpose(0, 2, 1, 3).reshape(bh, kv_len, head_dim)

        scores = jnp.einsum("bqd,bkd->bqk", qm, km).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(head_dim))
        scores = apply_attention_bias(
            scores.reshape(batch, self.num_heads, length, kv_len), attn_bias
        )
        weights = nn.softmax(scores, axis=-1).astype(resolve_dtype(self.dtype))
        weights = HashDropout(self.dropout_rate)(weights, deterministic=deterministic)

        out = jnp.einsum(
            "bqk,bkd->bqd", weights.reshape(bh, length, kv_len), vm
        ).reshape(batch, self.num_heads, length, head_dim).transpose(0, 2, 1, 3)
        out = nn.DenseGeneral(
            features=dim,
            axis=(-2, -1),
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            name="out",
        )(out)
        return out


class MultiHeadDifferentialAttention(nn.Module):
    """Differential attention (reference: replay/nn/attention.py:7, DIFF
    Transformer arXiv 2410.05258): two softmax attention maps subtracted with
    a learned lambda, reducing attention noise."""

    num_heads: int
    depth: int = 1  # layer index, sets lambda_init
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        batch, length, dim = x.shape
        head_dim = dim // self.num_heads // 2

        def project(name, n_out):
            return nn.DenseGeneral(
                features=(self.num_heads, n_out),
                dtype=resolve_dtype(self.dtype),
                param_dtype=jnp.float32,
                name=name,
            )

        q = project("query", 2 * head_dim)(x)
        k = project("key", 2 * head_dim)(x)
        v = project("value", 2 * head_dim)(x)
        q1, q2 = jnp.split(q, 2, axis=-1)
        k1, k2 = jnp.split(k, 2, axis=-1)

        lambda_init = 0.8 - 0.6 * jnp.exp(-0.3 * (self.depth - 1))
        shape = (self.num_heads, head_dim)
        init = nn.initializers.normal(stddev=0.1)
        lam_q1 = self.param("lambda_q1", init, shape, jnp.float32)
        lam_k1 = self.param("lambda_k1", init, shape, jnp.float32)
        lam_q2 = self.param("lambda_q2", init, shape, jnp.float32)
        lam_k2 = self.param("lambda_k2", init, shape, jnp.float32)
        lam = (
            jnp.exp(jnp.sum(lam_q1 * lam_k1, axis=-1))
            - jnp.exp(jnp.sum(lam_q2 * lam_k2, axis=-1))
            + lambda_init
        )  # [H]

        def attn(qh, kh):
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(head_dim))
            scores = apply_attention_bias(scores, attn_bias)
            return nn.softmax(scores, axis=-1)

        weights = attn(q1, k1) - lam[None, :, None, None] * attn(q2, k2)
        weights = HashDropout(self.dropout_rate)(
            weights.astype(resolve_dtype(self.dtype)), deterministic=deterministic
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="subln")(out)
        out = out * (1.0 - lambda_init)
        out = nn.DenseGeneral(
            features=dim,
            axis=(-2, -1),
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            name="out",
        )(out)
        return out
