"""Tensor feature schema for the neural data pipeline.

TPU-native counterpart of the reference's tensor schema (reference:
replay/data/nn/schema.py:13,56,242).  A ``TensorSchema`` declares, for every
feature that will appear in a device batch, its type (categorical / numerical /
categorical-list / numerical-list), cardinality, padding value, embedding
dimensions, whether it is sequential, and which source dataframe column it
comes from.  Downstream the schema drives embedding-table construction,
batch padding/masking, and loss label selection — everything must be static
so jitted programs see fixed shapes.
"""

from enum import Enum
from typing import (
    Callable,
    Dict,
    Iterable,
    Iterator,
    List,
    Mapping,
    Optional,
    Sequence,
    Union,
)

from replay_tpu.data.schema import FeatureHint, FeatureSource


class TensorFeatureType(Enum):
    """Tensor feature types (reference: replay/data/nn/schema.py FeatureType usage)."""

    CATEGORICAL = "categorical"
    NUMERICAL = "numerical"
    CATEGORICAL_LIST = "categorical_list"
    NUMERICAL_LIST = "numerical_list"


class TensorFeatureSource:
    """Link from a tensor feature back to its source dataframe column
    (reference: replay/data/nn/schema.py:13)."""

    def __init__(
        self,
        source: FeatureSource,
        column: str,
        index: Optional[int] = None,
    ) -> None:
        self._source = source
        self._column = column
        self._index = index

    @property
    def source(self) -> FeatureSource:
        return self._source

    @property
    def column(self) -> str:
        return self._column

    @property
    def index(self) -> Optional[int]:
        return self._index

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, TensorFeatureSource):
            return NotImplemented
        return (
            self.source == other.source
            and self.column == other.column
            and self.index == other.index
        )

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TensorFeatureSource({self._source}, {self._column!r}, {self._index})"


class TensorFeatureInfo:
    """Metadata for one tensor feature (reference: replay/data/nn/schema.py:56)."""

    def __init__(
        self,
        name: str,
        feature_type: TensorFeatureType,
        is_seq: bool = False,
        feature_hint: Optional[FeatureHint] = None,
        feature_sources: Optional[List[TensorFeatureSource]] = None,
        cardinality: Optional[int] = None,
        embedding_dim: Optional[int] = None,
        tensor_dim: Optional[int] = None,
        padding_value: int = 0,
    ) -> None:
        self._name = name
        if not isinstance(feature_type, TensorFeatureType):
            msg = "Unknown feature type"
            raise ValueError(msg)
        self._feature_type = feature_type
        self._is_seq = is_seq
        self._feature_hint = feature_hint
        self._feature_sources = feature_sources
        self._padding_value = padding_value

        if feature_type in (TensorFeatureType.NUMERICAL, TensorFeatureType.NUMERICAL_LIST) and (
            cardinality is not None or embedding_dim is not None
        ):
            msg = "Cardinality and embedding dimension are only applicable to categorical features."
            raise ValueError(msg)
        if feature_type in (TensorFeatureType.CATEGORICAL, TensorFeatureType.CATEGORICAL_LIST) and (
            tensor_dim is not None
        ):
            msg = "Tensor dimension is only applicable to numerical features."
            raise ValueError(msg)
        self._cardinality = cardinality
        self._embedding_dim = embedding_dim
        self._tensor_dim = tensor_dim

    # ------------------------------------------------------------- properties
    @property
    def name(self) -> str:
        return self._name

    @property
    def feature_type(self) -> TensorFeatureType:
        return self._feature_type

    @property
    def feature_hint(self) -> Optional[FeatureHint]:
        return self._feature_hint

    def _set_feature_hint(self, hint: FeatureHint) -> None:
        self._feature_hint = hint

    @property
    def feature_sources(self) -> Optional[List[TensorFeatureSource]]:
        return self._feature_sources

    def _set_feature_sources(self, sources: List[TensorFeatureSource]) -> None:
        self._feature_sources = sources

    @property
    def feature_source(self) -> Optional[TensorFeatureSource]:
        if not self._feature_sources:
            return None
        return self._feature_sources[0]

    @property
    def is_seq(self) -> bool:
        return self._is_seq

    @property
    def is_cat(self) -> bool:
        return self._feature_type in (
            TensorFeatureType.CATEGORICAL,
            TensorFeatureType.CATEGORICAL_LIST,
        )

    @property
    def is_num(self) -> bool:
        return self._feature_type in (
            TensorFeatureType.NUMERICAL,
            TensorFeatureType.NUMERICAL_LIST,
        )

    @property
    def is_list(self) -> bool:
        return self._feature_type in (
            TensorFeatureType.CATEGORICAL_LIST,
            TensorFeatureType.NUMERICAL_LIST,
        )

    @property
    def padding_value(self) -> int:
        return self._padding_value

    @property
    def cardinality(self) -> Optional[int]:
        return self._cardinality

    def _set_cardinality(self, cardinality: int) -> None:
        self._cardinality = cardinality

    @property
    def embedding_dim(self) -> Optional[int]:
        return self._embedding_dim

    def _set_embedding_dim(self, embedding_dim: int) -> None:
        self._embedding_dim = embedding_dim

    @property
    def tensor_dim(self) -> Optional[int]:
        return self._tensor_dim

    def _set_tensor_dim(self, tensor_dim: int) -> None:
        self._tensor_dim = tensor_dim

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, TensorFeatureInfo):
            return NotImplemented
        return (
            self.name == other.name
            and self.feature_type == other.feature_type
            and self.is_seq == other.is_seq
            and self.feature_hint == other.feature_hint
            and (self.feature_sources or []) == (other.feature_sources or [])
            and self.cardinality == other.cardinality
            and self.embedding_dim == other.embedding_dim
            and self.tensor_dim == other.tensor_dim
            and self.padding_value == other.padding_value
        )

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TensorFeatureInfo({self._name!r}, {self._feature_type}, seq={self._is_seq})"


class TensorSchema(Mapping[str, TensorFeatureInfo]):
    """Mapping of feature name → TensorFeatureInfo (reference:
    replay/data/nn/schema.py:242)."""

    def __init__(
        self,
        features_list: Union[Sequence[TensorFeatureInfo], TensorFeatureInfo],
    ) -> None:
        features = [features_list] if isinstance(features_list, TensorFeatureInfo) else list(features_list)
        self._features: Dict[str, TensorFeatureInfo] = {f.name: f for f in features}
        if len(self._features) != len(features):
            msg = "Tensor feature names must be unique"
            raise ValueError(msg)

    # ------------------------------------------------------------- mapping
    def __getitem__(self, feature_name: str) -> TensorFeatureInfo:
        return self._features[feature_name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._features)

    def __len__(self) -> int:
        return len(self._features)

    def __contains__(self, feature_name: object) -> bool:
        return feature_name in self._features

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, TensorSchema):
            return NotImplemented
        return self._features == other._features

    def __add__(self, other: "TensorSchema") -> "TensorSchema":
        return TensorSchema(list(self.all_features) + list(other.all_features))

    # ------------------------------------------------------------- accessors
    @property
    def all_features(self) -> Sequence[TensorFeatureInfo]:
        return list(self._features.values())

    @property
    def names(self) -> Sequence[str]:
        return list(self._features.keys())

    def subset(self, features_to_keep: Iterable[str]) -> "TensorSchema":
        keep = set(features_to_keep)
        return TensorSchema([f for name, f in self._features.items() if name in keep])

    def filter(
        self,
        name: Optional[str] = None,
        feature_hint: Optional[FeatureHint] = None,
        is_seq: Optional[bool] = None,
        feature_type: Optional[TensorFeatureType] = None,
    ) -> "TensorSchema":
        filters: List[Callable[[TensorFeatureInfo], bool]] = []
        if name is not None:
            filters.append(lambda f: f.name == name)
        if feature_hint is not None:
            filters.append(lambda f: f.feature_hint == feature_hint)
        if is_seq is not None:
            filters.append(lambda f: f.is_seq == is_seq)
        if feature_type is not None:
            filters.append(lambda f: f.feature_type == feature_type)
        return TensorSchema([f for f in self.all_features if all(p(f) for p in filters)])

    @property
    def categorical_features(self) -> "TensorSchema":
        return TensorSchema([f for f in self.all_features if f.is_cat])

    @property
    def numerical_features(self) -> "TensorSchema":
        return TensorSchema([f for f in self.all_features if f.is_num])

    @property
    def sequential_features(self) -> "TensorSchema":
        return TensorSchema([f for f in self.all_features if f.is_seq])

    @property
    def query_id_features(self) -> "TensorSchema":
        return self.filter(feature_hint=FeatureHint.QUERY_ID)

    @property
    def item_id_features(self) -> "TensorSchema":
        return self.filter(feature_hint=FeatureHint.ITEM_ID)

    @property
    def timestamp_features(self) -> "TensorSchema":
        return self.filter(feature_hint=FeatureHint.TIMESTAMP)

    @property
    def rating_features(self) -> "TensorSchema":
        return self.filter(feature_hint=FeatureHint.RATING)

    @property
    def item(self) -> TensorFeatureInfo:
        if len(self._features) != 1:
            msg = "Only one tensor feature is allowed for item()"
            raise ValueError(msg)
        return next(iter(self._features.values()))

    @property
    def item_id_feature_name(self) -> Optional[str]:
        names = self.item_id_features.names
        return names[0] if names else None

    @property
    def query_id_feature_name(self) -> Optional[str]:
        names = self.query_id_features.names
        return names[0] if names else None

    @property
    def timestamp_feature_name(self) -> Optional[str]:
        names = self.timestamp_features.names
        return names[0] if names else None

    @property
    def rating_feature_name(self) -> Optional[str]:
        names = self.rating_features.names
        return names[0] if names else None

    # ------------------------------------------------------------- save/load
    def _get_object_args(self) -> List[Dict]:
        return [
            {
                "name": f.name,
                "feature_type": f.feature_type.value,
                "is_seq": f.is_seq,
                "feature_hint": f.feature_hint.value if f.feature_hint else None,
                "feature_sources": [
                    {"source": s.source.value, "column": s.column, "index": s.index}
                    for s in (f.feature_sources or [])
                ],
                "cardinality": f.cardinality,
                "embedding_dim": f.embedding_dim,
                "tensor_dim": f.tensor_dim,
                "padding_value": f.padding_value,
            }
            for f in self.all_features
        ]

    @classmethod
    def _create_object_by_args(cls, args: List[Dict]) -> "TensorSchema":
        features = []
        for a in args:
            ftype = TensorFeatureType(a["feature_type"])
            is_cat = ftype in (TensorFeatureType.CATEGORICAL, TensorFeatureType.CATEGORICAL_LIST)
            features.append(
                TensorFeatureInfo(
                    name=a["name"],
                    feature_type=ftype,
                    is_seq=a["is_seq"],
                    feature_hint=FeatureHint(a["feature_hint"]) if a["feature_hint"] else None,
                    feature_sources=[
                        TensorFeatureSource(FeatureSource(s["source"]), s["column"], s["index"])
                        for s in a["feature_sources"]
                    ]
                    or None,
                    cardinality=a["cardinality"] if is_cat else None,
                    embedding_dim=a["embedding_dim"] if is_cat else None,
                    tensor_dim=a["tensor_dim"] if not is_cat else None,
                    padding_value=a["padding_value"],
                )
            )
        return cls(features)
