"""Embedding aggregators (reference: replay/nn/agg.py:23,56 — SumAggregator,
ConcatAggregator + protocol; PositionAwareAggregator
replay/nn/sequential/sasrec/agg.py:9).

Standalone blocks for custom model composition; ``SequenceEmbedding``'s
``aggregation_mode`` uses the same math inline.
"""

from typing import Dict, Sequence, Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype


class SumAggregator(nn.Module):
    """Sum per-feature embeddings (requires equal dims)."""

    @nn.compact
    def __call__(self, embeddings: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        values = list(embeddings.values())
        out = values[0]
        for v in values[1:]:
            out = out + v
        return out


class ConcatAggregator(nn.Module):
    """Concatenate per-feature embeddings then project to ``output_dim``."""

    output_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, embeddings: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        joined = jnp.concatenate(list(embeddings.values()), axis=-1)
        return nn.Dense(
            self.output_dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="proj"
        )(joined)


class PositionAwareAggregator(nn.Module):
    """Sum + learned positional embeddings + input scaling (reference:
    replay/nn/sequential/sasrec/agg.py:9 — the SasRec input pipeline as a
    standalone block)."""

    max_len: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, embeddings: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> jnp.ndarray:
        x = SumAggregator(name="sum")(embeddings)
        dim = x.shape[-1]
        positions = jnp.arange(self.max_len - x.shape[1], self.max_len)
        pos = nn.Embed(
            self.max_len,
            dim,
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.truncated_normal(stddev=0.02),
            name="pos_table",
        )(positions)
        x = x * jnp.sqrt(jnp.asarray(dim, dtype=x.dtype)) + pos[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
