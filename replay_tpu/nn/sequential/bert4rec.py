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
from replay_tpu.nn.attention import build_attention_bias_parts
from replay_tpu.nn.embedding import PositionalEmbedding, SequenceEmbedding
from replay_tpu.nn.head import tying_logits
from replay_tpu.nn.sequential.sasrec import SasRecTransformerLayer
from replay_tpu.nn.dropout import HashDropout


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
    # the reference's BertEmbedding applies NO LayerNorm before the blocks
    # and the stack ends without a final norm (model.py:173,:451); these
    # flags exist for torch-checkpoint import (interop.torch_import)
    use_input_norm: bool = True
    use_final_norm: bool = True
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
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
        self.input_norm = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32, name="input_norm",
        )
        self.input_dropout = HashDropout(self.dropout_rate)
        self.layers = [
            SasRecTransformerLayer(
                num_heads=self.num_heads,
                hidden_dim=self.hidden_dim or dim * 4,
                dropout_rate=self.dropout_rate,
                depth=i + 1,
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

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        pad = batch["padding_mask"]
        x = self.embedder(batch)
        x = x + self.pos_embedding(pad.shape[1])[None]
        if self.use_input_norm:
            x = self.input_norm(x)
        x = self.input_dropout(x, deterministic=deterministic)
        x = x * pad[..., None].astype(x.dtype)
        bias = build_attention_bias_parts(pad, causal=False)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        return self.final_norm(x) if self.use_final_norm else x

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
    use_input_norm: bool = True
    use_final_norm: bool = True
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
    # per-item output bias in the tying head (the reference's
    # EmbeddingTyingHead carries one, model.py:397); import sets True
    use_out_bias: bool = False
    # False = separate output projection (the reference's default
    # ClassificationHead, model.py:425) instead of weight tying
    tie_weights: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.body = Bert4RecBody(
            schema=self.schema,
            max_sequence_length=self.max_sequence_length,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            dropout_rate=self.dropout_rate,
            use_input_norm=self.use_input_norm,
            use_final_norm=self.use_final_norm,
            layer_norm_eps=self.layer_norm_eps,
            activation=self.activation,
            dtype=resolve_dtype(self.dtype),
            name="body",
        )
        n_items = self.schema[self.schema.item_id_feature_name].cardinality
        if self.use_out_bias:
            self.out_bias = self.param(
                "out_bias",
                lambda key, shape: jnp.zeros(shape, jnp.float32),
                (n_items,),
            )
        if not self.tie_weights:
            dim = self.schema[self.schema.item_id_feature_name].embedding_dim
            self.head_kernel = self.param(
                "head_kernel",
                nn.initializers.normal(0.02),
                (n_items, dim),
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
        weights = self._output_weights(candidates_to_score)
        logits = tying_logits(last, weights)
        return self._add_bias(logits, candidates_to_score)

    def _output_weights(self, item_ids=None):
        if self.tie_weights:
            return self.body.get_item_weights(item_ids)
        return self.head_kernel if item_ids is None else jnp.take(self.head_kernel, item_ids, axis=0)

    def _add_bias(self, logits, item_ids=None):
        if not self.use_out_bias:
            return logits
        bias = self.out_bias if item_ids is None else jnp.take(self.out_bias, item_ids)
        # catalog scoring may include the padding/mask rows beyond n_items
        if item_ids is None and logits.shape[-1] > bias.shape[0]:
            bias = jnp.pad(bias, (0, logits.shape[-1] - bias.shape[0]))
        return logits + bias

    def get_logits(self, hidden, item_ids=None):
        logits = tying_logits(hidden, self._output_weights(item_ids))
        return self._add_bias(logits, item_ids)

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
