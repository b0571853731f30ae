"""TiSasRec: time-interval aware self-attention (Li et al., WSDM 2020).

TPU-native analog of the reference TiSasRec variants (reference:
replay/models/nn/sequential/sasrec/model.py:532,649,710 — TiSasRec
embeddings/layers built on the SasRec stack).  Relative time intervals
between events, clipped to ``time_span``, index two embedding tables
(key-side and value-side); attention scores add q·r^K and outputs add the
attention-weighted r^V — the TiSasRec formulation, implemented as two
extra einsums per layer so everything stays on the MXU with static
[B, L, L] interval indices computed once per batch.
"""

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.nn.attention import apply_attention_bias, build_attention_bias_parts
from replay_tpu.nn.embedding import PositionalEmbedding, SequenceEmbedding
from replay_tpu.nn.ffn import PointWiseFeedForward
from replay_tpu.nn.head import tying_logits
from replay_tpu.nn.dropout import HashDropout


def relative_intervals(timestamps: jnp.ndarray, time_span: int) -> jnp.ndarray:
    """[B, L] timestamps → [B, L, L] clipped |t_i − t_j| interval indices.

    The reference personalizes by each user's minimal nonzero gap; here the
    raw gap is clipped to ``time_span`` (the paper's k) directly.
    """
    diff = jnp.abs(timestamps[:, :, None] - timestamps[:, None, :])
    return jnp.clip(diff, 0, time_span).astype(jnp.int32)


class TiSasRecLayer(nn.Module):
    """Causal MHA with relative time-interval key/value embeddings."""

    num_heads: int
    hidden_dim: int
    time_span: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, intervals, attn_bias, deterministic: bool = True):
        batch, length, dim = x.shape
        head_dim = dim // self.num_heads
        h = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="ln_attn")(x)

        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(self.num_heads, head_dim),
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            name=name,
        )
        q = dense("query")(h)
        k = dense("key")(h)
        v = dense("value")(h)
        r_k = nn.Embed(
            self.time_span + 1, head_dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="interval_k"
        )(intervals)  # [B, L, L, hd]
        r_v = nn.Embed(
            self.time_span + 1, head_dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="interval_v"
        )(intervals)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores + jnp.einsum("bqhd,bqkd->bhqk", q, r_k).astype(jnp.float32)
        scores = apply_attention_bias(scores / jnp.sqrt(jnp.float32(head_dim)), attn_bias)
        weights = nn.softmax(scores, axis=-1).astype(resolve_dtype(self.dtype))
        weights = HashDropout(self.dropout_rate)(weights, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out + jnp.einsum("bhqk,bqkd->bqhd", weights, r_v)
        out = nn.DenseGeneral(
            features=dim, axis=(-2, -1), dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="out"
        )(out)
        x = x + HashDropout(self.dropout_rate)(out, deterministic=deterministic)
        h = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="ln_ffn")(x)
        return x + PointWiseFeedForward(
            self.hidden_dim, self.dropout_rate, dtype=resolve_dtype(self.dtype), name="ffn"
        )(h, deterministic=deterministic)


class TiSasRec(nn.Module):
    """Time-interval SasRec with the standard train/inference contract.

    Batches must carry a ``timestamp`` sequential feature ([B, L] ints —
    seconds or any monotone unit; intervals are clipped to ``time_span``).
    """

    schema: TensorSchema
    max_sequence_length: int = 50
    num_blocks: int = 2
    num_heads: int = 2
    time_span: int = 256
    dropout_rate: float = 0.2
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embedder = SequenceEmbedding(
            schema=self.schema,
            excluded_features=("timestamp",),
            dtype=resolve_dtype(self.dtype),
            name="embedder",
        )
        dim = self.embedder.embedding_dim
        self.pos_embedding = PositionalEmbedding(
            max_len=self.max_sequence_length, embedding_dim=dim, dtype=resolve_dtype(self.dtype), name="pos"
        )
        self.input_dropout = HashDropout(self.dropout_rate)
        self.layers = [
            TiSasRecLayer(
                num_heads=self.num_heads,
                hidden_dim=dim * 4,
                time_span=self.time_span,
                dropout_rate=self.dropout_rate,
                dtype=resolve_dtype(self.dtype),
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.final_norm = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="final_norm")

    @property
    def body(self):
        return self

    def get_item_weights(self, item_ids=None):
        return self.embedder.get_item_weights(item_ids)

    def _encode(self, batch: Dict[str, jnp.ndarray], deterministic: bool) -> jnp.ndarray:
        pad = batch["padding_mask"]
        timestamps = batch["timestamp"]
        x = self.embedder(batch)
        x = x * jnp.sqrt(jnp.asarray(x.shape[-1], dtype=x.dtype))
        x = x + self.pos_embedding(pad.shape[1])[None]
        x = self.input_dropout(x, deterministic=deterministic)
        x = x * pad[..., None].astype(x.dtype)
        bias = build_attention_bias_parts(pad, causal=True)
        intervals = relative_intervals(timestamps, self.time_span)
        for layer in self.layers:
            x = layer(x, intervals, bias, deterministic=deterministic)
        return self.final_norm(x)

    def __call__(self, batch, deterministic: bool = True):
        return self.forward_train(batch, deterministic=deterministic)

    def forward_train(self, batch, deterministic: bool = False):
        return self._encode(batch, deterministic)

    def forward_inference(self, batch, candidates_to_score: Optional[jnp.ndarray] = None):
        hidden = self._encode(batch, True)
        return tying_logits(hidden[:, -1, :], self.get_item_weights(candidates_to_score))

    def get_query_embeddings(self, batch):
        return self._encode(batch, True)[:, -1, :]
