"""TwoTower retrieval model: query tower × item tower.

TPU-native analog of the reference TwoTower (reference:
replay/nn/sequential/twotower/model.py — QueryTower :53, ItemTower :127,
TwoTowerBody :340, TwoTower :431; FeaturesReader reader.py:18).

- **Query tower**: sequence embedder over the user's history → transformer
  encoder → LayerNorm, yielding per-position query embeddings (the same
  causal shape as SasRec so next-token training reuses the Trainer/loss
  contract unchanged).
- **Item tower**: item-id embedding + optional per-item feature embeddings
  (the reference's ItemTower feature buffers) aggregated and passed through
  an MLP encoder.  Feature values for the WHOLE catalog live in a flax
  ``constants`` variable collection — the analog of torch
  ``register_buffer`` — initialized once from arrays passed to
  ``model.init(..., item_features=...)`` and checkpointed with the model.
- Logits = query · item-tower output; ``get_item_weights`` exposes the item
  tower through the same tying-head contract as the other models, so
  in-batch (LogInCE), sampled, and full CE losses all work.

TPU note: the item tower over the full catalog is one [N, F] × MLP pass —
batched, dense, MXU-shaped; it is recomputed per step during training
(cheap vs. the encoder) and cached by callers at inference.
"""

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.nn.attention import build_attention_bias
from replay_tpu.nn.embedding import (
    CategoricalEmbedding,
    PositionalEmbedding,
    SequenceEmbedding,
)
from replay_tpu.nn.head import tying_logits
from replay_tpu.nn.sequential.sasrec import SasRecTransformerLayer


class ItemTower(nn.Module):
    """Item-side encoder over the full catalog (reference:
    replay/nn/sequential/twotower/model.py:127)."""

    n_items: int
    embedding_dim: int
    item_schema: Optional[TensorSchema] = None
    hidden_dims: Sequence[int] = ()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        item_ids: Optional[jnp.ndarray] = None,
        item_features: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        id_table = CategoricalEmbedding(
            cardinality=self.n_items, embedding_dim=self.embedding_dim, dtype=resolve_dtype(self.dtype), name="id_emb"
        )
        all_ids = jnp.arange(self.n_items)
        x = id_table(all_ids)  # [N, D]
        if self.item_schema is not None:
            for feature in self.item_schema.all_features:
                name = feature.name
                buf = self.variable(
                    "constants",
                    name,
                    lambda n=name: jnp.asarray(item_features[n]),
                )
                values = buf.value
                if feature.is_cat:
                    emb = CategoricalEmbedding(
                        cardinality=feature.cardinality,
                        embedding_dim=self.embedding_dim,
                        dtype=resolve_dtype(self.dtype),
                        name=f"feat_{name}",
                    )(values)
                    if emb.ndim == 3:  # list feature [N, slots, D] → mean
                        emb = jnp.mean(emb, axis=1)
                else:
                    vals = values.astype(resolve_dtype(self.dtype))
                    if vals.ndim == 1:
                        vals = vals[:, None]
                    emb = nn.Dense(
                        self.embedding_dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name=f"feat_{name}"
                    )(vals)
                x = x + emb
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name=f"mlp_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.embedding_dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="out"
        )(x)
        if item_ids is not None:
            x = jnp.take(x, item_ids, axis=0)
        return x


class TwoTowerBody(nn.Module):
    """Query encoder + item tower (reference: twotower/model.py:340)."""

    schema: TensorSchema
    max_sequence_length: int
    num_blocks: int = 1
    num_heads: int = 2
    dropout_rate: float = 0.1
    item_schema: Optional[TensorSchema] = None
    item_hidden_dims: Sequence[int] = ()
    causal: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embedder = SequenceEmbedding(schema=self.schema, dtype=resolve_dtype(self.dtype), name="embedder")
        dim = self.embedder.embedding_dim
        self.pos_embedding = PositionalEmbedding(
            max_len=self.max_sequence_length, embedding_dim=dim, dtype=resolve_dtype(self.dtype), name="pos"
        )
        self.input_dropout = nn.Dropout(self.dropout_rate)
        self.layers = [
            SasRecTransformerLayer(
                num_heads=self.num_heads,
                hidden_dim=dim * 4,
                dropout_rate=self.dropout_rate,
                depth=i + 1,
                dtype=resolve_dtype(self.dtype),
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.final_norm = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="final_norm")
        item_name = self.schema.item_id_feature_name
        self.item_tower = ItemTower(
            n_items=self.schema[item_name].cardinality,
            embedding_dim=dim,
            item_schema=self.item_schema,
            hidden_dims=self.item_hidden_dims,
            dtype=resolve_dtype(self.dtype),
            name="item_tower",
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        deterministic: bool = True,
        item_features: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        pad = batch["padding_mask"]
        x = self.embedder(batch)
        x = x + self.pos_embedding(pad.shape[1])[None]
        x = self.input_dropout(x, deterministic=deterministic)
        x = x * pad[..., None].astype(x.dtype)
        bias = build_attention_bias(pad, causal=self.causal)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        x = self.final_norm(x)
        # touch the item tower so init creates its params/constants
        _ = self.item_tower(jnp.arange(1), item_features)
        return x

    def get_item_weights(self, item_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.item_tower(item_ids)


class TwoTower(nn.Module):
    """TwoTower with the standard train/inference contract (reference:
    twotower/model.py:431)."""

    schema: TensorSchema
    max_sequence_length: int = 50
    num_blocks: int = 1
    num_heads: int = 2
    dropout_rate: float = 0.1
    item_schema: Optional[TensorSchema] = None
    item_hidden_dims: tuple = ()
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.body = TwoTowerBody(
            schema=self.schema,
            max_sequence_length=self.max_sequence_length,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            item_schema=self.item_schema,
            item_hidden_dims=self.item_hidden_dims,
            dtype=resolve_dtype(self.dtype),
            name="body",
        )

    def __call__(self, batch, deterministic: bool = True, item_features=None):
        return self.body(batch, deterministic=deterministic, item_features=item_features)

    def forward_train(self, batch, deterministic: bool = False):
        return self.body(batch, deterministic=deterministic)

    def forward_inference(self, batch, candidates_to_score=None):
        hidden = self.body(batch, deterministic=True)
        last = hidden[:, -1, :]
        weights = self.body.get_item_weights(candidates_to_score)
        return tying_logits(last, weights)

    def get_logits(self, hidden, item_ids=None):
        return tying_logits(hidden, self.body.get_item_weights(item_ids))

    def get_query_embeddings(self, batch):
        return self.body(batch, deterministic=True)[:, -1, :]


# Reference name (replay/nn/sequential/twotower/model.py:53 QueryTower): the
# TPU design fuses the query tower into the body — TwoTowerBody.__call__ IS
# the query encoder (returns per-position query embeddings); the item side
# lives behind get_item_weights/ItemTower.
QueryTower = TwoTowerBody
