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

from typing import Dict, List, Optional, Protocol, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from replay_tpu.nn.dtypes import resolve_dtype

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.nn.attention import build_attention_bias_parts
from replay_tpu.nn.embedding import (
    CategoricalEmbedding,
    PositionalEmbedding,
    SequenceEmbedding,
)
from replay_tpu.nn.ffn import SwiGLUEncoder
from replay_tpu.nn.head import tying_logits
from replay_tpu.nn.sequential.sasrec import SasRecTransformerLayer
from replay_tpu.nn.dropout import HashDropout


class ItemFeatureStore(nn.Module):
    """Catalog feature buffers (reference ItemTower's ``register_buffer``
    loading, replay/nn/sequential/twotower/model.py:175-233).

    Flax ``constants`` collection: initialized once from the arrays passed
    to ``model.init(..., item_features=...)``, checkpointed with the model.
    """

    item_schema: Optional[TensorSchema] = None

    @nn.compact
    def __call__(
        self, item_features: Optional[Dict[str, jnp.ndarray]] = None
    ) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        if self.item_schema is None:
            return out
        for feature in self.item_schema.all_features:
            name = feature.name
            buf = self.variable(
                "constants", name, lambda n=name: jnp.asarray(item_features[n])
            )
            out[name] = buf.value
        return out


class ItemTower(nn.Module):
    """Item-side encoder (reference:
    replay/nn/sequential/twotower/model.py:127 + from_params :536).

    Matching the reference composition, the item tower does NOT own an
    item-id table: id/shared-feature embeddings come from the SHARED query
    embedder (summed by ``TwoTowerBody.get_item_weights`` before this
    module runs).  Here live the tables for item-ONLY features absent from
    the shared embedder, plus the default SwiGLU MLP encoder
    (SwiGLUEncoder, reference ffn.py:102).
    """

    embedding_dim: int
    hidden_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, own_features=()) -> jnp.ndarray:
        for feature, values in own_features:
            if feature.is_cat:
                emb = CategoricalEmbedding(
                    cardinality=feature.cardinality,
                    embedding_dim=self.embedding_dim,
                    dtype=resolve_dtype(self.dtype),
                    name=f"feat_{feature.name}",
                )(values)
                if emb.ndim == 3:  # list feature [N, slots, D] → mean
                    emb = jnp.mean(emb, axis=1)
            else:
                vals = values.astype(resolve_dtype(self.dtype))
                if vals.ndim == 1:
                    vals = vals[:, None]
                emb = nn.Dense(
                    self.embedding_dim,
                    dtype=resolve_dtype(self.dtype),
                    param_dtype=jnp.float32,
                    name=f"feat_{feature.name}",
                )(vals)
            x = x + emb
        return SwiGLUEncoder(
            hidden_dim=self.hidden_dim or 2 * self.embedding_dim,
            dtype=resolve_dtype(self.dtype),
            name="encoder",
        )(x)


class TwoTowerBody(nn.Module):
    """Query encoder + item tower (reference: twotower/model.py:340)."""

    schema: TensorSchema
    max_sequence_length: int
    num_blocks: int = 1
    num_heads: int = 2
    dropout_rate: float = 0.1
    item_schema: Optional[TensorSchema] = None
    # SwiGLU encoder hidden width; None = the reference default 2*dim
    item_hidden_dim: Optional[int] = None
    causal: bool = True
    # query-encoder knobs shared with SasRecBody (the reference's TwoTower
    # query tower IS a SasRec transformer stack, twotower/model.py:536)
    hidden_dim: Optional[int] = None
    variant: str = "preln"  # "preln" | "kang"
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
    # PositionAwareAggregator multiplies embeddings by sqrt(D) before adding
    # positions (reference sasrec/agg.py:50)
    scale_embeddings: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embedder = SequenceEmbedding(schema=self.schema, dtype=resolve_dtype(self.dtype), name="embedder")
        dim = self.embedder.embedding_dim
        self.pos_embedding = PositionalEmbedding(
            max_len=self.max_sequence_length, embedding_dim=dim, dtype=resolve_dtype(self.dtype), name="pos"
        )
        self.input_dropout = HashDropout(self.dropout_rate)
        self.layers = [
            SasRecTransformerLayer(
                num_heads=self.num_heads,
                hidden_dim=self.hidden_dim or dim * 4,
                dropout_rate=self.dropout_rate,
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
        # named "item_tower" so the constants live at
        # constants/body/item_tower/<feature> (checkpoint compatibility)
        self.item_tower = ItemFeatureStore(item_schema=self.item_schema, name="item_tower")
        self.item_encoder = ItemTower(
            embedding_dim=dim,
            hidden_dim=self.item_hidden_dim,
            dtype=resolve_dtype(self.dtype),
            name="item_encoder",
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        deterministic: bool = True,
        item_features: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        pad = batch["padding_mask"]
        x = self.embedder(batch)
        if self.scale_embeddings:
            x = x * jnp.sqrt(jnp.asarray(x.shape[-1], dtype=x.dtype))
        x = x + self.pos_embedding(pad.shape[1])[None]
        x = self.input_dropout(x, deterministic=deterministic)
        x = x * pad[..., None].astype(x.dtype)
        bias = build_attention_bias_parts(pad, causal=self.causal)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        x = self.final_norm(x)
        # touch the item tower so init creates its params/constants
        _ = self.get_item_weights(jnp.arange(1), item_features=item_features)
        return x

    def get_item_weights(
        self,
        item_ids: Optional[jnp.ndarray] = None,
        item_features: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Item-tower outputs for the tying head.

        Reference contract (twotower/model.py:295-338 + from_params): every
        item feature embeds through the SHARED embedder when its name is in
        the query schema, through the item tower's own table otherwise; the
        summed embedding runs through the SwiGLU item encoder.
        """
        feats = self.item_tower(item_features)
        item_name = self.schema.item_id_feature_name
        n_items = self.schema[item_name].cardinality
        x = self.embedder.embed_feature(item_name, jnp.arange(n_items))
        own = []
        if self.item_schema is not None:
            shared = set(self.embedder.feature_names)
            for feature in self.item_schema.all_features:
                if feature.name in shared:
                    x = x + self.embedder.embed_feature(feature.name, feats[feature.name])
                else:
                    own.append((feature, feats[feature.name]))
        x = self.item_encoder(x, tuple(own))
        if item_ids is not None:
            x = jnp.take(x, item_ids, axis=0)
        return x


class TwoTower(nn.Module):
    """TwoTower with the standard train/inference contract (reference:
    twotower/model.py:431)."""

    schema: TensorSchema
    max_sequence_length: int = 50
    num_blocks: int = 1
    num_heads: int = 2
    dropout_rate: float = 0.1
    item_schema: Optional[TensorSchema] = None
    item_hidden_dim: Optional[int] = None
    hidden_dim: Optional[int] = None
    variant: str = "preln"
    layer_norm_eps: float = 1e-6
    activation: str = "relu"
    scale_embeddings: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.body = TwoTowerBody(
            schema=self.schema,
            max_sequence_length=self.max_sequence_length,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            item_schema=self.item_schema,
            item_hidden_dim=self.item_hidden_dim,
            hidden_dim=self.hidden_dim,
            variant=self.variant,
            layer_norm_eps=self.layer_norm_eps,
            activation=self.activation,
            scale_embeddings=self.scale_embeddings,
            dtype=resolve_dtype(self.dtype),
            name="body",
        )

    @classmethod
    def from_params(
        cls,
        schema: TensorSchema,
        item_features_reader=None,
        num_heads: int = 2,
        num_blocks: int = 1,
        max_sequence_length: int = 50,
        dropout: float = 0.1,
        item_hidden_dim: Optional[int] = None,
    ) -> "TwoTower":
        """Convenience factory mirroring the reference's ``from_params``
        (reference: replay/nn/sequential/twotower/model.py:536).
        ``item_features_reader`` (a :class:`FeaturesReader`) supplies the
        item-feature schema the ItemTower consumes; its feature constants are
        bound at ``Trainer.init_state`` via ``init_kwargs['item_features']``."""
        item_schema = (
            item_features_reader.item_schema
            if item_features_reader is not None
            else None
        )
        return cls(
            schema=schema,
            max_sequence_length=max_sequence_length,
            num_blocks=num_blocks,
            num_heads=num_heads,
            dropout_rate=dropout,
            item_schema=item_schema,
            item_hidden_dim=item_hidden_dim,
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


class FeaturesReaderProtocol(Protocol):
    """reference: replay/nn/sequential/twotower/reader.py:11."""

    def __getitem__(self, key: str): ...

    @property
    def feature_names(self) -> List[str]: ...


class FeaturesReader:
    """Item-feature table loader for the ItemTower (reference:
    replay/nn/sequential/twotower/reader.py:18).

    Reads an (already encoded) item-features parquet and produces one dense
    array per schema item feature, row-indexed by item id, padded/truncated
    to the ``metadata`` shape — the dict TwoTower consumes as
    ``init_kwargs={"item_features": dict(reader)}``.

    :param schema: the TwoTower item schema; every feature must carry an
        ITEM_FEATURES source (or be the item-id feature).
    :param metadata: ``{feature_name: {"shape": int, "padding_value": v}}``
        for list features; scalar features may be omitted.
    :param path: parquet path; extra kwargs go to ``pandas.read_parquet``.
    """

    def __init__(self, schema, metadata: Optional[Dict] = None, path: str = "",
                 **kwargs):
        import pandas as pd

        from replay_tpu.data.schema import FeatureSource

        if schema.item_id_feature_name is None:
            msg = "FeaturesReader needs an item-id feature in the schema"
            raise ValueError(msg)
        self.item_schema = schema
        metadata = metadata or {}
        columns: Dict[str, str] = {}
        for info in schema.all_features:
            name = info.name
            src = (info.feature_sources or [None])[0]
            if name == schema.item_id_feature_name or (
                src is not None and src.source == FeatureSource.ITEM_FEATURES
            ):
                columns[name] = src.column if src is not None else name
        unknown = set(metadata) - set(columns)
        if unknown:
            msg = f"metadata names not in the item schema: {sorted(unknown)}"
            raise ValueError(msg)
        df = pd.read_parquet(path, columns=sorted(set(columns.values())),
                             **kwargs)
        id_col = columns[schema.item_id_feature_name]
        ids = np.asarray(df[id_col], dtype=np.int64)
        n_rows = int(ids.max()) + 1 if len(ids) else 0
        self._arrays: Dict[str, np.ndarray] = {}
        for name, col in columns.items():
            if name == schema.item_id_feature_name:
                continue
            meta = metadata.get(name, {})
            pad_value = meta.get("padding_value", 0)
            values = df[col].to_numpy()
            if len(values) and isinstance(values[0], (list, np.ndarray)):
                width = meta.get("shape") or max(len(v) for v in values)
                out = np.full((n_rows, width), pad_value, dtype=np.int64)
                for i, v in zip(ids, values):
                    v = np.asarray(v)[:width]
                    out[i, : len(v)] = v
            else:
                out = np.full((n_rows,), pad_value,
                              dtype=np.asarray(values).dtype)
                out[ids] = values
            self._arrays[name] = out

    def __getitem__(self, key: str) -> np.ndarray:
        return self._arrays[key]

    def __iter__(self):
        return iter(self._arrays.items())

    def keys(self):
        return self._arrays.keys()

    @property
    def feature_names(self) -> List[str]:
        return list(self._arrays)
