"""Fluent TensorSchema builder.

reference: replay/experimental/nn/data/schema_builder.py:5
"""

from typing import List, Optional

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.schema import FeatureHint


class TensorSchemaBuilder:
    """Chainable ``.categorical(...).numerical(...).build()`` construction
    of a :class:`TensorSchema`."""

    def __init__(self) -> None:
        self._features: List[TensorFeatureInfo] = []

    def categorical(
        self,
        name: str,
        cardinality: int,
        is_seq: bool = False,
        feature_source: Optional[TensorFeatureSource] = None,
        feature_hint: Optional[FeatureHint] = None,
        embedding_dim: Optional[int] = None,
        padding_value: int = 0,
    ) -> "TensorSchemaBuilder":
        self._features.append(
            TensorFeatureInfo(
                name=name,
                feature_type=TensorFeatureType.CATEGORICAL,
                is_seq=is_seq,
                feature_sources=[feature_source] if feature_source else None,
                feature_hint=feature_hint,
                cardinality=cardinality,
                embedding_dim=embedding_dim,
                padding_value=padding_value,
            )
        )
        return self

    def numerical(
        self,
        name: str,
        tensor_dim: int,
        is_seq: bool = False,
        feature_sources: Optional[List[TensorFeatureSource]] = None,
        feature_hint: Optional[FeatureHint] = None,
        padding_value: int = 0,
    ) -> "TensorSchemaBuilder":
        self._features.append(
            TensorFeatureInfo(
                name=name,
                feature_type=TensorFeatureType.NUMERICAL,
                is_seq=is_seq,
                feature_sources=feature_sources,
                feature_hint=feature_hint,
                tensor_dim=tensor_dim,
                padding_value=padding_value,
            )
        )
        return self

    def build(self) -> TensorSchema:
        return TensorSchema(self._features)
