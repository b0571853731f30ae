"""Bert4Rec: bidirectional masked-item sequence model (arXiv 1904.06690).

TPU-native analog of the reference Bert4Rec (reference:
replay/models/nn/sequential/bert4rec/{lightning,model,dataset}.py —
BertEmbedding model.py:173, ClassificationHead :425, masked training via
Bert4RecUniformMasker dataset.py:55).

Differences from SasRec: the attention band is FULL (padding-only bias),
training replaces sampled positions with a learned mask token
(replay_tpu/nn/transforms.MaskedLMTransform) and the loss fires only at
masked positions; inference shifts the window left and places the mask
token at the final position, whose hidden state scores the catalog — the
reference's prediction-dataset behavior, done with static-shape jnp rolls
instead of a second dataset class.

The mask-token id is ``cardinality + 1`` (the item table always reserves
rows for padding and mask: replay_tpu/nn/embedding.CategoricalEmbedding).
"""

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.nn.attention import build_attention_bias
from replay_tpu.nn.embedding import PositionalEmbedding, SequenceEmbedding
from replay_tpu.nn.head import tying_logits
from replay_tpu.nn.sequential.sasrec import SasRecTransformerLayer


def mask_token_id(schema: TensorSchema) -> int:
    return schema[schema.item_id_feature_name].cardinality + 1


class Bert4RecBody(nn.Module):
    """Embedder → bidirectional encoder → norm."""

    schema: TensorSchema
    max_sequence_length: int
    num_blocks: int = 2
    num_heads: int = 2
    hidden_dim: Optional[int] = None
    dropout_rate: float = 0.1
    excluded_features: tuple = ()
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embedder = SequenceEmbedding(
            schema=self.schema,
            excluded_features=self.excluded_features,
            dtype=resolve_dtype(self.dtype),
            name="embedder",
        )
        dim = self.embedder.embedding_dim
        self.pos_embedding = PositionalEmbedding(
            max_len=self.max_sequence_length, embedding_dim=dim, dtype=resolve_dtype(self.dtype), name="pos"
        )
        self.input_norm = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="input_norm")
        self.input_dropout = nn.Dropout(self.dropout_rate)
        self.layers = [
            SasRecTransformerLayer(
                num_heads=self.num_heads,
                hidden_dim=self.hidden_dim or dim * 4,
                dropout_rate=self.dropout_rate,
                depth=i + 1,
                dtype=resolve_dtype(self.dtype),
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.final_norm = nn.LayerNorm(dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="final_norm")

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        pad = batch["padding_mask"]
        x = self.embedder(batch)
        x = x + self.pos_embedding(pad.shape[1])[None]
        x = self.input_dropout(self.input_norm(x), deterministic=deterministic)
        x = x * pad[..., None].astype(x.dtype)
        bias = build_attention_bias(pad, causal=False)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        return self.final_norm(x)

    def get_item_weights(self, item_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.embedder.get_item_weights(item_ids)


class Bert4Rec(nn.Module):
    """Bert4Rec with train/inference entry points."""

    schema: TensorSchema
    max_sequence_length: int = 50
    num_blocks: int = 2
    num_heads: int = 2
    hidden_dim: Optional[int] = None
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.body = Bert4RecBody(
            schema=self.schema,
            max_sequence_length=self.max_sequence_length,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            dropout_rate=self.dropout_rate,
            dtype=resolve_dtype(self.dtype),
            name="body",
        )

    def __call__(self, batch, deterministic: bool = True) -> jnp.ndarray:
        return self.forward_train(batch, deterministic=deterministic)

    def forward_train(self, batch, deterministic: bool = False) -> jnp.ndarray:
        return self.body(batch, deterministic=deterministic)

    def forward_inference(
        self,
        batch: Dict[str, jnp.ndarray],
        candidates_to_score: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Shift left, place [MASK] at the last position, score it."""
        item_name = self.schema.item_id_feature_name
        mask_id = mask_token_id(self.schema)
        shifted = dict(batch)
        items = jnp.roll(batch[item_name], -1, axis=1)
        shifted[item_name] = items.at[:, -1].set(mask_id)
        pad = jnp.roll(batch["padding_mask"], -1, axis=1)
        shifted["padding_mask"] = pad.at[:, -1].set(1)
        hidden = self.body(shifted, deterministic=True)
        last = hidden[:, -1, :]
        weights = self.body.get_item_weights(candidates_to_score)
        return tying_logits(last, weights)

    def get_logits(self, hidden, item_ids=None):
        return tying_logits(hidden, self.body.get_item_weights(item_ids))

    def get_query_embeddings(self, batch):
        item_name = self.schema.item_id_feature_name
        mask_id = mask_token_id(self.schema)
        shifted = dict(batch)
        items = jnp.roll(batch[item_name], -1, axis=1)
        shifted[item_name] = items.at[:, -1].set(mask_id)
        pad = jnp.roll(batch["padding_mask"], -1, axis=1)
        shifted["padding_mask"] = pad.at[:, -1].set(1)
        return self.body(shifted, deterministic=True)[:, -1, :]


# reference name (replay/models/nn/sequential/bert4rec/model.py Bert4RecModel)
Bert4RecModel = Bert4RecBody
