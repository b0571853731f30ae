"""SASRec: self-attentive sequential recommendation (arXiv 1808.09781).

TPU-native analog of the reference's block-based SasRec (reference:
replay/nn/sequential/sasrec/model.py:43 SasRecBody, :116 SasRec;
transformer layer replay/nn/sequential/sasrec/transformer.py:10).

Architecture = embedder (item + extra features, learned positions) →
pre-LayerNorm causal transformer stack → final LayerNorm.  Logits come from
weight tying against the item table (replay/nn/head.py:4) via
``get_logits`` which accepts an optional candidate subset — the same
three-way contract (full catalog / sampled / candidates) as the reference.

TPU design:
- params float32, activations bfloat16; logits float32 out of the MXU;
- static [B, L] shapes; padding handled by additive attention bias
  (replay_tpu/nn/attention.py) and loss masks — no dynamic shapes anywhere;
- ``forward_inference`` returns only the last position's hidden state
  (the reference slices the same way) so full-catalog scoring is one
  [B, D] x [D, N] GEMM, Pallas-fused with top-k in replay_tpu/ops.
"""

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.nn.agg import PositionAwareAggregator  # noqa: F401  (reference
# export surface: replay/nn/sequential/sasrec/__init__.py re-exports the
# position-aware aggregator alongside the model)
from replay_tpu.nn.attention import (
    MultiHeadDifferentialAttention,
    MultiHeadSelfAttention,
    build_attention_bias_parts,
)
from replay_tpu.nn.embedding import PositionalEmbedding, SequenceEmbedding
from replay_tpu.nn.ffn import PointWiseFeedForward, SwiGLU
from replay_tpu.nn.head import tying_logits
from replay_tpu.nn.dropout import HashDropout


class SasRecTransformerLayer(nn.Module):
    """Transformer block (reference: replay/nn/sequential/sasrec/transformer.py:10).

    ``variant="preln"`` (default) is the standard pre-LN residual block.
    ``variant="kang"`` reproduces the reference/original-SASRec wiring
    exactly (transformer.py:98): the query alone is normalized, keys/values
    come from the raw stream, the attention residual is taken from the
    NORMALIZED query, and the FFN residual from the normalized input —
    needed for bit-compatible torch-checkpoint import (interop.torch_import).
    """

    num_heads: int
    hidden_dim: int
    dropout_rate: float = 0.0
    attention: str = "default"  # "default" | "diff"
    ffn: str = "pointwise"  # "pointwise" | "swiglu"
    depth: int = 1
    variant: str = "preln"  # "preln" | "kang"
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.layer_norm_eps, dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32, name=name,
        )
        h = ln("ln_attn")(x)
        if self.attention == "diff":
            attn = MultiHeadDifferentialAttention(
                num_heads=self.num_heads,
                depth=self.depth,
                dropout_rate=self.dropout_rate,
                dtype=resolve_dtype(self.dtype),
                name="attn",
            )
        else:
            attn = MultiHeadSelfAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                dtype=resolve_dtype(self.dtype),
                name="attn",
            )
        if self.variant == "kang":
            a = attn(h, attn_bias, deterministic=deterministic, kv=x)
            x = h + HashDropout(self.dropout_rate)(a, deterministic=deterministic)
        else:
            x = x + HashDropout(self.dropout_rate)(
                attn(h, attn_bias, deterministic=deterministic),
                deterministic=deterministic,
            )
        h = ln("ln_ffn")(x)
        if self.ffn == "swiglu":
            ff = SwiGLU(self.hidden_dim, self.dropout_rate, dtype=resolve_dtype(self.dtype), name="ffn")
        else:
            ff = PointWiseFeedForward(
                self.hidden_dim, self.dropout_rate,
                activation=self.activation, dtype=resolve_dtype(self.dtype),
                name="ffn",
            )
        base = h if self.variant == "kang" else x
        return base + ff(h, deterministic=deterministic)


class SasRecBody(nn.Module):
    """Embedder → aggregation → encoder → norm composition (reference:
    replay/nn/sequential/sasrec/model.py:43)."""

    schema: TensorSchema
    max_sequence_length: int
    num_blocks: int = 2
    num_heads: int = 2
    hidden_dim: Optional[int] = None
    embedding_dim: Optional[int] = None
    dropout_rate: float = 0.2
    attention: str = "default"
    ffn: str = "pointwise"
    excluded_features: tuple = ()
    variant: str = "preln"  # "preln" | "kang" (see SasRecTransformerLayer)
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
    # the sqrt(D) input scaling is this framework's default; the reference's
    # new-tier SasRec omits it (PositionAwareAggregator adds raw embeddings)
    scale_embeddings: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embedder = SequenceEmbedding(
            schema=self.schema,
            excluded_features=self.excluded_features,
            embedding_dim_override=self.embedding_dim,
            dtype=resolve_dtype(self.dtype),
            name="embedder",
        )
        dim = self.embedder.embedding_dim
        self.pos_embedding = PositionalEmbedding(
            max_len=self.max_sequence_length,
            embedding_dim=dim,
            dtype=resolve_dtype(self.dtype),
            name="pos",
        )
        self.input_dropout = HashDropout(self.dropout_rate)
        self.layers = [
            SasRecTransformerLayer(
                num_heads=self.num_heads,
                hidden_dim=self.hidden_dim or dim * 4,
                dropout_rate=self.dropout_rate,
                attention=self.attention,
                ffn=self.ffn,
                depth=i + 1,
                variant=self.variant,
                layer_norm_eps=self.layer_norm_eps,
                activation=self.activation,
                dtype=resolve_dtype(self.dtype),
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.final_norm = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32, name="final_norm",
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        pad = batch["padding_mask"]
        length = pad.shape[1]
        x = self.embedder(batch)
        if self.scale_embeddings:
            x = x * jnp.sqrt(jnp.asarray(x.shape[-1], dtype=x.dtype))
        x = x + self.pos_embedding(length)[None]
        x = self.input_dropout(x, deterministic=deterministic)
        # zero out padding embeddings so they contribute nothing downstream
        x = x * pad[..., None].astype(x.dtype)
        bias = build_attention_bias_parts(pad, causal=True)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        return self.final_norm(x)

    def get_item_weights(self, item_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.embedder.get_item_weights(item_ids)


class SasRec(nn.Module):
    """SasRec with train/inference entry points (reference:
    replay/nn/sequential/sasrec/model.py:116)."""

    schema: TensorSchema
    max_sequence_length: int = 50
    num_blocks: int = 2
    num_heads: int = 2
    hidden_dim: Optional[int] = None
    embedding_dim: Optional[int] = None
    dropout_rate: float = 0.2
    attention: str = "default"
    ffn: str = "pointwise"
    variant: str = "preln"
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
    scale_embeddings: bool = True
    dtype: Optional[jnp.dtype] = None

    extra_excluded_features: tuple = ()

    @classmethod
    def from_params(
        cls,
        schema: TensorSchema,
        embedding_dim: Optional[int] = None,
        num_heads: int = 4,
        num_blocks: int = 2,
        max_sequence_length: int = 50,
        dropout: float = 0.3,
        excluded_features: Optional[list] = None,
        attention: str = "default",
        ffn: str = "pointwise",
    ) -> "SasRec":
        """Convenience factory mirroring the reference's ``from_params``
        (reference: replay/nn/sequential/sasrec/model.py:200); query-id and
        timestamp features are excluded from the embedder automatically,
        ``excluded_features`` adds to that set.  ``embedding_dim`` overrides
        the schema's per-feature embedding dims with one model width
        (reference default 192 is the reference's, not this factory's —
        None keeps schema dims)."""
        return cls(
            schema=schema,
            max_sequence_length=max_sequence_length,
            num_blocks=num_blocks,
            num_heads=num_heads,
            embedding_dim=embedding_dim,
            dropout_rate=dropout,
            attention=attention,
            ffn=ffn,
            extra_excluded_features=tuple(excluded_features or ()),
        )

    def setup(self):
        excluded = tuple(
            name
            for name in (
                self.schema.query_id_feature_name,
                self.schema.timestamp_feature_name,
                *self.extra_excluded_features,
            )
            if name is not None
        )
        self.body = SasRecBody(
            excluded_features=excluded,
            schema=self.schema,
            max_sequence_length=self.max_sequence_length,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            embedding_dim=self.embedding_dim,
            dropout_rate=self.dropout_rate,
            attention=self.attention,
            ffn=self.ffn,
            variant=self.variant,
            layer_norm_eps=self.layer_norm_eps,
            activation=self.activation,
            scale_embeddings=self.scale_embeddings,
            dtype=resolve_dtype(self.dtype),
            name="body",
        )

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        """Training forward: hidden states for every position ([B, L, D])."""
        return self.forward_train(batch, deterministic=deterministic)

    def forward_train(self, batch, deterministic: bool = False) -> jnp.ndarray:
        return self.body(batch, deterministic=deterministic)

    def forward_inference(
        self,
        batch: Dict[str, jnp.ndarray],
        candidates_to_score: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Last-position logits over catalog or candidates ([B, N] float32)."""
        hidden = self.body(batch, deterministic=True)
        last = hidden[:, -1, :]
        weights = self.body.get_item_weights(candidates_to_score)
        return tying_logits(last, weights)

    def get_logits(
        self, hidden: jnp.ndarray, item_ids: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return tying_logits(hidden, self.body.get_item_weights(item_ids))

    def get_query_embeddings(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self.body(batch, deterministic=True)[:, -1, :]


def DiffTransformerLayer(**kwargs):
    """Reference name (replay/nn/sequential/sasrec/transformer.py
    DiffTransformerLayer): a SasRecTransformerLayer with differential
    attention preselected."""
    kwargs.setdefault("attention", "diff")
    return SasRecTransformerLayer(**kwargs)


DiffTransformerBlock = DiffTransformerLayer


# reference name: the inner network behind the lightning wrapper
# (replay/models/nn/sequential/sasrec/model.py SasRecModel)
SasRecModel = SasRecBody
