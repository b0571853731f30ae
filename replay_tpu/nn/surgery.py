"""Embedding surgery: grow/replace the item table of a trained model.

TPU-native analog of the reference's catalog-growth API (reference:
replay/models/nn/sequential/sasrec/lightning.py:22 —
``set_item_embeddings_by_size``, ``set_item_embeddings_by_tensor``,
``append_item_embeddings``), used when the item catalog grows after
training: old rows keep their weights, new rows are initialized (or
provided), and the model continues training / serving with the larger
vocabulary.

Functional style: params in → params out, plus the matching new
TensorSchema.  The table keeps the padding/mask rows at the END
(replay_tpu/nn/embedding.CategoricalEmbedding layout), so growth moves the
pad/mask rows out and fills the gap.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.nn.embedding import CategoricalEmbedding

_TABLE_PATH = ("body", "embedder", "emb_item_id", "table", "embedding")


def _get_at(params, path):
    node = params
    for key in path:
        node = node[key]
    return node


def _set_at(params, path, value):
    if not path:
        return value
    head, *rest = path
    out = dict(params)
    out[head] = _set_at(params[head], rest, value)
    return out


def _grown_schema(schema: TensorSchema, new_cardinality: int) -> TensorSchema:
    features = []
    for f in schema.all_features:
        if f.name == schema.item_id_feature_name:
            features.append(
                TensorFeatureInfo(
                    name=f.name,
                    feature_type=f.feature_type,
                    is_seq=f.is_seq,
                    feature_hint=f.feature_hint,
                    feature_sources=f.feature_sources,
                    cardinality=new_cardinality,
                    embedding_dim=f.embedding_dim,
                    padding_value=new_cardinality,
                )
            )
        else:
            features.append(f)
    return TensorSchema(features)


def set_item_embeddings_by_size(
    params,
    schema: TensorSchema,
    new_cardinality: int,
    seed: int = 0,
    table_path: Tuple[str, ...] = _TABLE_PATH,
) -> Tuple[dict, TensorSchema]:
    """Resize the item table to ``new_cardinality`` (grow only).

    Existing item rows are preserved; new rows draw from the same
    truncated-normal init as training (reference
    ``set_item_embeddings_by_size``).
    """
    old_card = schema[schema.item_id_feature_name].cardinality
    if new_cardinality < old_card:
        msg = f"Cannot shrink catalog from {old_card} to {new_cardinality}"
        raise ValueError(msg)
    table = _get_at(params, table_path)
    dim = table.shape[1]
    new_rows_total = CategoricalEmbedding.padded_rows(new_cardinality)
    key = jax.random.PRNGKey(seed)
    fresh = (
        jax.random.truncated_normal(key, -2.0, 2.0, (new_rows_total, dim), table.dtype)
        * 0.02
    )
    # keep item rows [0:old_card]; pad/mask rows re-initialized at the end
    new_table = fresh.at[:old_card].set(table[:old_card])
    return _set_at(params, table_path, new_table), _grown_schema(schema, new_cardinality)


def set_item_embeddings_by_tensor(
    params,
    schema: TensorSchema,
    tensor: np.ndarray,
    table_path: Tuple[str, ...] = _TABLE_PATH,
) -> Tuple[dict, TensorSchema]:
    """Replace item rows with ``tensor`` [new_cardinality, D] (reference
    ``set_item_embeddings_by_tensor``)."""
    table = _get_at(params, table_path)
    tensor = jnp.asarray(tensor, dtype=table.dtype)
    new_card, dim = tensor.shape
    if dim != table.shape[1]:
        msg = f"Embedding dim mismatch: table {table.shape[1]}, tensor {dim}"
        raise ValueError(msg)
    new_rows_total = CategoricalEmbedding.padded_rows(new_card)
    new_table = jnp.zeros((new_rows_total, dim), dtype=table.dtype).at[:new_card].set(tensor)
    return _set_at(params, table_path, new_table), _grown_schema(schema, new_card)


def append_item_embeddings(
    params,
    schema: TensorSchema,
    tensor: np.ndarray,
    table_path: Tuple[str, ...] = _TABLE_PATH,
) -> Tuple[dict, TensorSchema]:
    """Append rows for NEW items after the existing catalog (reference
    ``append_item_embeddings``)."""
    old_card = schema[schema.item_id_feature_name].cardinality
    table = _get_at(params, table_path)
    tensor = jnp.asarray(tensor, dtype=table.dtype)
    if tensor.ndim == 1:
        tensor = tensor[None]
    n_new, dim = tensor.shape
    if dim != table.shape[1]:
        msg = f"Embedding dim mismatch: table {table.shape[1]}, tensor {dim}"
        raise ValueError(msg)
    new_card = old_card + n_new
    new_rows_total = CategoricalEmbedding.padded_rows(new_card)
    new_table = jnp.zeros((new_rows_total, dim), dtype=table.dtype)
    new_table = new_table.at[:old_card].set(table[:old_card])
    new_table = new_table.at[old_card:new_card].set(tensor)
    return _set_at(params, table_path, new_table), _grown_schema(schema, new_card)
