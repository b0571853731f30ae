"""Feature embeddings for sequential batches.

TPU-native analog of the reference embedding layer (reference:
replay/nn/embedding.py:21,121,240,290).  A ``SequenceEmbedding`` owns one
sub-embedding per schema feature and an aggregation mode (sum | concat),
exactly the embedder protocol the reference's ``SasRecBody`` composes.

Design notes (TPU):
- tables are plain ``nn.Embed`` params in float32; lookups cast to the
  compute dtype so downstream matmuls hit the MXU in bfloat16;
- item-id table rows are the tying-head weights (``get_item_weights``), so
  the table is kept at its full ``[cardinality + 1, D]`` size with the
  padding row present but zero-masked at aggregation time;
- for multi-chip, the table is row-shardable over the ``model`` mesh axis —
  lookups become all-gather-free because XLA turns gather-on-sharded-operand
  into collective-permute chains; see replay_tpu/parallel.
"""

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype

from replay_tpu.data.nn.schema import TensorSchema


class CategoricalEmbedding(nn.Module):
    """Embedding for one categorical feature (reference: replay/nn/embedding.py:121).

    Row count is ``cardinality + 1`` rounded up to a multiple of 128: the
    +1 row serves as padding id, and 128-alignment keeps the table
    lane-aligned on TPU and row-shardable over any power-of-two ``model``
    mesh axis (replay_tpu/parallel/sharding.py).  Rows past
    ``cardinality`` are never produced by the encoder, so the padding only
    costs memory, not correctness.
    """

    cardinality: int
    embedding_dim: int
    dtype: Optional[jnp.dtype] = None

    @staticmethod
    def padded_rows(cardinality: int) -> int:
        # +2: one padding row and one mask-token row (Bert4Rec) always fit
        return -(-(cardinality + 2) // 128) * 128

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = nn.Embed(
            num_embeddings=self.padded_rows(self.cardinality),
            features=self.embedding_dim,
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.truncated_normal(stddev=0.02),
            name="table",
        )
        return table(ids)


class NumericalEmbedding(nn.Module):
    """Linear projection of a numerical feature into the embedding space
    (reference: replay/nn/embedding.py:240)."""

    tensor_dim: int
    embedding_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, values: jnp.ndarray) -> jnp.ndarray:
        if values.ndim == 2:  # [B, L] scalar feature → [B, L, 1]
            values = values[..., None]
        proj = nn.Dense(
            self.embedding_dim,
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            name="proj",
        )
        return proj(values.astype(resolve_dtype(self.dtype)))


class SequenceEmbedding(nn.Module):
    """Multi-feature sequence embedder (reference: replay/nn/embedding.py:21).

    Embeds every sequential feature in the schema and aggregates:
    ``aggregation_mode='sum'`` requires equal embedding dims; ``'concat'``
    concatenates along the feature axis.  Exposes ``get_item_weights`` for
    weight tying with the output head (reference:
    replay/nn/sequential/sasrec/model.py:258-265).
    """

    schema: TensorSchema
    aggregation_mode: str = "sum"
    excluded_features: Sequence[str] = ()
    # list-feature slot aggregation (reference SequenceEmbedding's
    # categorical_list_feature_aggregation_method): sum | mean | max
    list_aggregation: str = "sum"
    # global width override (the reference from_params' ``embedding_dim``,
    # replay/nn/sequential/sasrec/model.py:203): when set, every feature
    # embeds at this dim regardless of the schema's per-feature dims
    embedding_dim_override: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        embedders: Dict[str, nn.Module] = {}
        for feature in self.schema.sequential_features.all_features:
            if feature.name in self.excluded_features:
                continue
            if feature.is_cat:
                embedders[feature.name] = CategoricalEmbedding(
                    cardinality=feature.cardinality,
                    embedding_dim=self.embedding_dim_override or feature.embedding_dim,
                    dtype=resolve_dtype(self.dtype),
                    name=f"emb_{feature.name}",
                )
            else:
                embedders[feature.name] = NumericalEmbedding(
                    tensor_dim=feature.tensor_dim or 1,
                    embedding_dim=self._target_dim(),
                    dtype=resolve_dtype(self.dtype),
                    name=f"emb_{feature.name}",
                )
        self._embedders = embedders

    def _target_dim(self) -> int:
        if self.embedding_dim_override:
            return self.embedding_dim_override
        dims = [
            f.embedding_dim
            for f in self.schema.sequential_features.all_features
            if f.is_cat and f.embedding_dim and f.name not in self.excluded_features
        ]
        return dims[0] if dims else 64

    @property
    def embedding_dim(self) -> int:
        if self.aggregation_mode == "concat":
            return sum(
                (self.embedding_dim_override or f.embedding_dim or self._target_dim())
                for f in self.schema.sequential_features.all_features
                if f.name not in self.excluded_features
            )
        return self._target_dim()

    @property
    def feature_names(self) -> Sequence[str]:
        return [
            f.name
            for f in self.schema.sequential_features.all_features
            if f.name not in self.excluded_features
        ]

    def embed_feature(
        self,
        name: str,
        values: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One feature's embedding through ITS table — the reference's
        shared-embedder contract (TwoTower's item tower reuses the query
        tower's tables, replay/nn/sequential/twotower/model.py:393-413).
        List features aggregate their slot axis per ``list_aggregation``.
        """
        feature = self.schema[name]
        emb = self._embedders[name](values)
        if feature.is_list and feature.is_cat:
            # [..., S, D] slot embeddings → [..., D]; slots using the
            # padding id contribute zero (mask before aggregation)
            if mask is not None:
                slot_mask = mask[..., None].astype(emb.dtype)
            else:
                slot_mask = (values != feature.padding_value)[..., None].astype(emb.dtype)
            emb = emb * slot_mask
            if self.list_aggregation == "mean":
                denom = jnp.maximum(jnp.sum(slot_mask, axis=-2), 1.0)
                emb = jnp.sum(emb, axis=-2) / denom
            elif self.list_aggregation == "max":
                emb = jnp.max(
                    jnp.where(slot_mask > 0, emb, jnp.float32(-3e38).astype(emb.dtype)),
                    axis=-2,
                )
            else:
                emb = jnp.sum(emb, axis=-2)
        return emb

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        outputs = [
            self.embed_feature(name, batch[name], mask=batch.get(f"{name}_mask"))
            for name in self._embedders
        ]
        if self.aggregation_mode == "concat":
            return jnp.concatenate(outputs, axis=-1)
        result = outputs[0]
        for other in outputs[1:]:
            result = result + other
        return result

    def get_item_weights(self, item_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Item-id table rows (for the tying head).  ``None`` → full catalog
        (without the spare padding row)."""
        item_name = self.schema.item_id_feature_name
        table = self._embedders[item_name].variables["params"]["table"]["embedding"]
        cardinality = self.schema[item_name].cardinality
        weights = table[:cardinality]
        if item_ids is not None:
            weights = jnp.take(table, item_ids, axis=0)
        return weights.astype(resolve_dtype(self.dtype))


class PositionalEmbedding(nn.Module):
    """Learned absolute positions (reference SasRec convention:
    replay/models/nn/sequential/sasrec/model.py:310 SasRecEmbeddings)."""

    max_len: int
    embedding_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, seq_len: int) -> jnp.ndarray:
        table = nn.Embed(
            num_embeddings=self.max_len,
            features=self.embedding_dim,
            dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.truncated_normal(stddev=0.02),
            name="pos_table",
        )
        # right-aligned: last position of the table lines up with the most
        # recent event, stable under varying seq_len ≤ max_len
        positions = jnp.arange(self.max_len - seq_len, self.max_len)
        return table(positions)
