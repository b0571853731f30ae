"""Feature metadata: types, sources, hints, and the FeatureSchema container.

API-compatible with the reference schema layer (reference:
replay/data/schema.py:5-119) so pipelines written against RePlay's
``FeatureSchema`` run unchanged, but implemented as a flat immutable mapping
with functional filter/drop algebra.
"""

from enum import Enum
from typing import Callable, Dict, Iterable, Iterator, List, Mapping, Optional, Sequence, Union


class FeatureType(Enum):
    """Type of a feature column."""

    CATEGORICAL = "categorical"
    CATEGORICAL_LIST = "categorical_list"
    NUMERICAL = "numerical"
    NUMERICAL_LIST = "numerical_list"


class FeatureSource(Enum):
    """Which dataframe a feature column lives in."""

    ITEM_FEATURES = "item_features"
    QUERY_FEATURES = "query_features"
    INTERACTIONS = "interactions"


class FeatureHint(Enum):
    """Semantic role hint for a column."""

    ITEM_ID = "item_id"
    QUERY_ID = "query_id"
    RATING = "rating"
    TIMESTAMP = "timestamp"


class FeatureInfo:
    """Metadata for one feature column."""

    def __init__(
        self,
        column: str,
        feature_type: FeatureType,
        feature_hint: Optional[FeatureHint] = None,
        feature_source: Optional[FeatureSource] = None,
        cardinality: Optional[int] = None,
    ) -> None:
        self._column = column
        self._feature_type = feature_type
        self._feature_hint = feature_hint
        self._feature_source = feature_source
        if feature_type in (FeatureType.NUMERICAL, FeatureType.NUMERICAL_LIST) and cardinality:
            msg = "Cardinality is only defined for categorical feature types."
            raise ValueError(msg)
        self._cardinality = cardinality
        self._cardinality_callback: Optional[Callable[[str], int]] = None

    @property
    def column(self) -> str:
        return self._column

    @property
    def feature_type(self) -> FeatureType:
        return self._feature_type

    @property
    def feature_hint(self) -> Optional[FeatureHint]:
        return self._feature_hint

    @property
    def feature_source(self) -> Optional[FeatureSource]:
        return self._feature_source

    def _set_feature_source(self, source: FeatureSource) -> None:
        self._feature_source = source

    @property
    def cardinality(self) -> Optional[int]:
        if self._feature_type not in (FeatureType.CATEGORICAL, FeatureType.CATEGORICAL_LIST):
            msg = f"Column '{self.column}' is not categorical; cardinality is undefined."
            raise RuntimeError(msg)
        if self._cardinality is None and self._cardinality_callback is not None:
            self._cardinality = self._cardinality_callback(self._column)
        return self._cardinality

    def _set_cardinality_callback(self, callback: Callable[[str], int]) -> None:
        self._cardinality_callback = callback

    def __getstate__(self):
        # the lazy-cardinality callback is a Dataset-bound closure and not
        # picklable; Dataset.__setstate__ re-links it on restore
        state = dict(self.__dict__)
        state["_cardinality_callback"] = None
        return state

    def reset_cardinality(self) -> None:
        self._cardinality = None

    def copy(self) -> "FeatureInfo":
        return FeatureInfo(
            column=self._column,
            feature_type=self._feature_type,
            feature_hint=self._feature_hint,
            feature_source=self._feature_source,
            cardinality=self._cardinality,
        )

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"FeatureInfo(column={self._column!r}, type={self._feature_type.value}, "
            f"hint={self._feature_hint}, source={self._feature_source})"
        )

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, FeatureInfo):
            return NotImplemented
        return (
            self._column == other._column
            and self._feature_type == other._feature_type
            and self._feature_hint == other._feature_hint
            and self._feature_source == other._feature_source
        )


class FeatureSchema(Mapping[str, FeatureInfo]):
    """Ordered mapping column-name -> FeatureInfo with filter/drop algebra."""

    def __init__(self, features_list: Union[Sequence[FeatureInfo], FeatureInfo]) -> None:
        if isinstance(features_list, FeatureInfo):
            features_list = [features_list]
        self._check_naming(features_list)
        self._features: Dict[str, FeatureInfo] = {f.column: f for f in features_list}

    # -- Mapping protocol ---------------------------------------------------
    def __getitem__(self, feature_name: str) -> FeatureInfo:
        return self._features[feature_name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._features)

    def __len__(self) -> int:
        return len(self._features)

    def __bool__(self) -> bool:
        return bool(self._features)

    def __contains__(self, feature_name: object) -> bool:
        return feature_name in self._features

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, FeatureSchema):
            return NotImplemented
        return list(self._features.values()) == list(other._features.values())

    def __add__(self, other: "FeatureSchema") -> "FeatureSchema":
        return FeatureSchema(list(self.all_features) + list(other.all_features))

    # -- construction helpers ------------------------------------------------
    def copy(self) -> "FeatureSchema":
        return FeatureSchema([f.copy() for f in self._features.values()])

    def subset(self, features_to_keep: Iterable[str]) -> "FeatureSchema":
        keep = set(features_to_keep)
        return FeatureSchema([f for name, f in self._features.items() if name in keep])

    def item(self) -> FeatureInfo:
        if len(self._features) != 1:
            msg = f"Schema has {len(self._features)} features; item() needs exactly one."
            raise ValueError(msg)
        return next(iter(self._features.values()))

    # -- views ----------------------------------------------------------------
    @property
    def all_features(self) -> Sequence[FeatureInfo]:
        return list(self._features.values())

    @property
    def columns(self) -> Sequence[str]:
        return list(self._features.keys())

    @property
    def categorical_features(self) -> "FeatureSchema":
        return self.filter(feature_type=FeatureType.CATEGORICAL)

    @property
    def numerical_features(self) -> "FeatureSchema":
        return self.filter(feature_type=FeatureType.NUMERICAL)

    @property
    def interaction_features(self) -> "FeatureSchema":
        return self.filter(feature_source=FeatureSource.INTERACTIONS).drop(
            feature_hint=FeatureHint.QUERY_ID
        ).drop(feature_hint=FeatureHint.ITEM_ID)

    @property
    def query_features(self) -> "FeatureSchema":
        return self.filter(feature_source=FeatureSource.QUERY_FEATURES)

    @property
    def item_features(self) -> "FeatureSchema":
        return self.filter(feature_source=FeatureSource.ITEM_FEATURES)

    @property
    def interactions_rating_features(self) -> "FeatureSchema":
        return self.filter(feature_hint=FeatureHint.RATING)

    @property
    def interactions_timestamp_features(self) -> "FeatureSchema":
        return self.filter(feature_hint=FeatureHint.TIMESTAMP)

    @property
    def query_id_feature(self) -> FeatureInfo:
        return self.filter(feature_hint=FeatureHint.QUERY_ID).item()

    @property
    def item_id_feature(self) -> FeatureInfo:
        return self.filter(feature_hint=FeatureHint.ITEM_ID).item()

    @property
    def query_id_column(self) -> str:
        return self.query_id_feature.column

    @property
    def item_id_column(self) -> str:
        return self.item_id_feature.column

    @property
    def interactions_rating_column(self) -> Optional[str]:
        cols = self.interactions_rating_features.columns
        return cols[0] if cols else None

    @property
    def interactions_timestamp_column(self) -> Optional[str]:
        cols = self.interactions_timestamp_features.columns
        return cols[0] if cols else None

    # -- filter / drop algebra -------------------------------------------------
    def filter(
        self,
        column: Optional[str] = None,
        feature_hint: Optional[FeatureHint] = None,
        feature_source: Optional[FeatureSource] = None,
        feature_type: Optional[FeatureType] = None,
    ) -> "FeatureSchema":
        """Keep features matching every provided predicate."""
        out: List[FeatureInfo] = []
        for f in self._features.values():
            if column is not None and f.column != column:
                continue
            if feature_hint is not None and f.feature_hint != feature_hint:
                continue
            if feature_source is not None and f.feature_source != feature_source:
                continue
            if feature_type is not None and f.feature_type != feature_type:
                continue
            out.append(f)
        return FeatureSchema(out)

    def drop(
        self,
        column: Optional[str] = None,
        feature_hint: Optional[FeatureHint] = None,
        feature_source: Optional[FeatureSource] = None,
        feature_type: Optional[FeatureType] = None,
    ) -> "FeatureSchema":
        """Remove features matching any provided predicate."""
        out: List[FeatureInfo] = []
        for f in self._features.values():
            if column is not None and f.column == column:
                continue
            if feature_hint is not None and f.feature_hint == feature_hint:
                continue
            if feature_source is not None and f.feature_source == feature_source:
                continue
            if feature_type is not None and f.feature_type == feature_type:
                continue
            out.append(f)
        return FeatureSchema(out)

    # -- internal ---------------------------------------------------------------
    @staticmethod
    def _check_naming(features_list: Sequence[FeatureInfo]) -> None:
        names = [f.column for f in features_list]
        if len(names) != len(set(names)):
            dupes = sorted({n for n in names if names.count(n) > 1})
            msg = f"Duplicate feature columns in schema: {dupes}."
            raise ValueError(msg)
        hints = [f.feature_hint for f in features_list if f.feature_hint is not None]
        for hint in (FeatureHint.QUERY_ID, FeatureHint.ITEM_ID):
            if hints.count(hint) > 1:
                msg = f"Multiple columns declare feature_hint={hint}."
                raise ValueError(msg)
