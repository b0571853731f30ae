"""Universal interaction Dataset.

TPU-native rework of the reference container (reference:
replay/data/dataset.py:33-796).  One columnar CPU backend (pandas) instead of
the reference's triple pandas/polars/spark dispatch; device-side views are
produced lazily by models as padded/masked jax arrays.
"""

import json
from pathlib import Path
from typing import Callable, Iterable, Optional, Sequence, Union

import numpy as np
import pandas as pd

from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)

_SAVE_DIR_SUFFIX = ".replay"


def _ingest(frame) -> pd.DataFrame:
    """Accept pandas (native), polars, or pyarrow inputs at the Dataset
    boundary — the reference's multi-backend API surface mapped onto the
    single pandas CPU data plane."""
    if isinstance(frame, pd.DataFrame):
        return frame
    if hasattr(frame, "to_pandas"):  # polars.DataFrame / pyarrow.Table
        return frame.to_pandas()
    return pd.DataFrame(frame)


class Dataset:
    """Interactions + optional query/item feature frames under a FeatureSchema."""

    def __init__(
        self,
        feature_schema: FeatureSchema,
        interactions: pd.DataFrame,
        query_features: Optional[pd.DataFrame] = None,
        item_features: Optional[pd.DataFrame] = None,
        check_consistency: bool = True,
        categorical_encoded: bool = False,
    ):
        interactions = _ingest(interactions)
        query_features = _ingest(query_features) if query_features is not None else None
        item_features = _ingest(item_features) if item_features is not None else None
        self._interactions = interactions
        self._query_features = query_features
        self._item_features = item_features
        self._categorical_encoded = categorical_encoded

        try:
            feature_schema.item_id_column
        except Exception as exception:
            msg = "Item id column is not set."
            raise ValueError(msg) from exception
        try:
            feature_schema.query_id_column
        except Exception as exception:
            msg = "Query id column is not set."
            raise ValueError(msg) from exception

        self._feature_schema = self._fill_feature_schema(feature_schema.copy())

        if check_consistency:
            if self._query_features is not None:
                self._check_ids_consistency(FeatureHint.QUERY_ID)
            if self._item_features is not None:
                self._check_ids_consistency(FeatureHint.ITEM_ID)
            if categorical_encoded:
                self._check_encoded()

    # -- basic accessors ------------------------------------------------------
    @property
    def is_categorical_encoded(self) -> bool:
        return self._categorical_encoded

    @property
    def interactions(self) -> pd.DataFrame:
        return self._interactions

    @property
    def query_features(self) -> Optional[pd.DataFrame]:
        return self._query_features

    @property
    def item_features(self) -> Optional[pd.DataFrame]:
        return self._item_features

    @property
    def feature_schema(self) -> FeatureSchema:
        return self._feature_schema

    @property
    def query_ids(self) -> pd.DataFrame:
        """Distinct query ids across interactions and query features."""
        col = self._feature_schema.query_id_column
        return self._distinct_ids(col, self._query_features)

    @property
    def item_ids(self) -> pd.DataFrame:
        """Distinct item ids across interactions and item features."""
        col = self._feature_schema.item_id_column
        return self._distinct_ids(col, self._item_features)

    def _distinct_ids(self, col: str, extra_frame: Optional[pd.DataFrame]) -> pd.DataFrame:
        parts = [self._interactions[col].to_numpy()]
        if extra_frame is not None and col in extra_frame.columns:
            parts.append(extra_frame[col].to_numpy())
        ids = pd.unique(np.concatenate(parts)) if len(parts) > 1 else pd.unique(parts[0])
        ids = np.sort(ids)
        return pd.DataFrame({col: ids})

    @property
    def query_count(self) -> int:
        """Number of queries; requires encoded ids (max id + 1)."""
        if not self._categorical_encoded:
            return len(self.query_ids)
        card = self._feature_schema.query_id_feature.cardinality
        assert card is not None
        return card

    @property
    def item_count(self) -> int:
        if not self._categorical_encoded:
            return len(self.item_ids)
        card = self._feature_schema.item_id_feature.cardinality
        assert card is not None
        return card

    # -- no-op persistence hooks (Spark-API compatibility) ---------------------
    def persist(self, *args, **kwargs) -> None:
        """No-op; kept for API parity with Spark-backed datasets."""

    def unpersist(self, *args, **kwargs) -> None:
        """No-op; kept for API parity."""

    def cache(self) -> None:
        """No-op; kept for API parity."""

    @property
    def is_pandas(self) -> bool:
        """Always True: the CPU data plane is pandas (polars/arrow inputs are
        ingested at the boundary; reference triple-backend parity)."""
        return True

    def to_polars(self):  # pragma: no cover - polars absent in CI image
        """Return (interactions, query_features, item_features) as polars
        frames (requires the optional polars dependency)."""
        from replay_tpu.utils.common import convert2polars

        return (
            convert2polars(self._interactions),
            convert2polars(self._query_features) if self._query_features is not None else None,
            convert2polars(self._item_features) if self._item_features is not None else None,
        )

    def to_pandas(self) -> None:
        """No-op; frames are already pandas."""

    def to_spark(self):
        """Spark is not a backend of this framework (reference API surface:
        replay/data/dataset.py to_spark).  Converts through pandas when
        pyspark happens to be installed; raises otherwise."""
        from replay_tpu.utils.types import PYSPARK_AVAILABLE, FeatureUnavailableError

        if not PYSPARK_AVAILABLE:  # pragma: no cover - pyspark absent in image
            msg = (
                "Spark is not available; replay_tpu's host data plane is "
                "pandas (use to_pandas()/to_polars()). Distribution is via "
                "per-host parquet shards + jax.sharding, not Spark."
            )
            raise FeatureUnavailableError(msg)
        from pyspark.sql import SparkSession  # pragma: no cover

        spark = SparkSession.builder.getOrCreate()  # pragma: no cover
        return spark.createDataFrame(self._interactions)  # pragma: no cover

    # -- subset ----------------------------------------------------------------
    def subset(self, features_to_keep: Iterable[str]) -> "Dataset":
        keep = set(features_to_keep)
        keep.add(self._feature_schema.query_id_column)
        keep.add(self._feature_schema.item_id_column)
        schema = self._feature_schema.subset(keep)

        def _project(frame: Optional[pd.DataFrame], source: FeatureSource, id_cols):
            if frame is None:
                return None
            cols = [c for c in frame.columns if c in keep]
            want = set(schema.filter(feature_source=source).columns) | set(id_cols)
            cols = [c for c in frame.columns if c in want]
            if not cols:
                return None
            return frame[cols]

        interactions_cols = [
            c
            for c in self._interactions.columns
            if c in schema.columns
        ]
        return Dataset(
            feature_schema=schema,
            interactions=self._interactions[interactions_cols],
            query_features=_project(
                self._query_features, FeatureSource.QUERY_FEATURES, [self._feature_schema.query_id_column]
            ),
            item_features=_project(
                self._item_features, FeatureSource.ITEM_FEATURES, [self._feature_schema.item_id_column]
            ),
            check_consistency=False,
            categorical_encoded=self._categorical_encoded,
        )

    # -- save / load -------------------------------------------------------------
    def save(self, path: str) -> None:
        """Save as a ``<name>.replay`` directory with JSON metadata + parquet frames."""
        base = Path(path).with_suffix(_SAVE_DIR_SUFFIX).resolve()
        base.mkdir(parents=True, exist_ok=True)
        schema_meta = [
            {
                "column": f.column,
                "feature_type": f.feature_type.value,
                "feature_hint": f.feature_hint.value if f.feature_hint else None,
                "feature_source": f.feature_source.value if f.feature_source else None,
                "cardinality": f._cardinality,
            }
            for f in self._feature_schema.all_features
        ]
        meta = {
            "_class_name": "Dataset",
            "categorical_encoded": self._categorical_encoded,
            "feature_schema": schema_meta,
            "has_query_features": self._query_features is not None,
            "has_item_features": self._item_features is not None,
        }
        (base / "init_args.json").write_text(json.dumps(meta, indent=2))
        self._interactions.to_parquet(base / "interactions.parquet")
        if self._query_features is not None:
            self._query_features.to_parquet(base / "query_features.parquet")
        if self._item_features is not None:
            self._item_features.to_parquet(base / "item_features.parquet")

    @classmethod
    def load(cls, path: str, dataframe_type: Optional[str] = None) -> "Dataset":
        base = Path(path)
        if base.suffix != _SAVE_DIR_SUFFIX:
            base = base.with_suffix(_SAVE_DIR_SUFFIX)
        meta = json.loads((base / "init_args.json").read_text())
        features = []
        for f in meta["feature_schema"]:
            features.append(
                FeatureInfo(
                    column=f["column"],
                    feature_type=FeatureType(f["feature_type"]),
                    feature_hint=FeatureHint(f["feature_hint"]) if f["feature_hint"] else None,
                    feature_source=FeatureSource(f["feature_source"]) if f["feature_source"] else None,
                    cardinality=f["cardinality"],
                )
            )
        return cls(
            feature_schema=FeatureSchema(features),
            interactions=pd.read_parquet(base / "interactions.parquet"),
            query_features=(
                pd.read_parquet(base / "query_features.parquet") if meta["has_query_features"] else None
            ),
            item_features=(
                pd.read_parquet(base / "item_features.parquet") if meta["has_item_features"] else None
            ),
            check_consistency=False,
            categorical_encoded=meta["categorical_encoded"],
        )

    def __setstate__(self, state):
        """Re-link the lazy-cardinality closures FeatureInfo.__getstate__
        drops, so a pickled Dataset round-trips fully functional."""
        self.__dict__.update(state)
        for f in self._feature_schema.all_features:
            if f.feature_type in (FeatureType.CATEGORICAL, FeatureType.CATEGORICAL_LIST):
                src = f.feature_source or FeatureSource.INTERACTIONS
                f._set_cardinality_callback(self._cardinality_callback(src))

    # -- schema completion ---------------------------------------------------------
    def _frame_for_source(self, source: FeatureSource) -> Optional[pd.DataFrame]:
        return {
            FeatureSource.INTERACTIONS: self._interactions,
            FeatureSource.QUERY_FEATURES: self._query_features,
            FeatureSource.ITEM_FEATURES: self._item_features,
        }[source]

    def _cardinality_callback(self, source: FeatureSource) -> Callable[[str], int]:
        def callback(column: str) -> int:
            if self._categorical_encoded:
                # encoded columns are contiguous ints starting at 0
                frame = self._frame_for_source(source)
                assert frame is not None
                return int(frame[column].max()) + 1
            return int(nunique(self._frame_for_source(source), column))

        return callback

    def _fill_feature_schema(self, schema: FeatureSchema) -> FeatureSchema:
        """Assign sources to declared features; add undeclared columns as numerical."""
        query_col = schema.query_id_column
        item_col = schema.item_id_column

        known = set(schema.columns)
        completed = list(schema.all_features)

        source_frames = [
            (FeatureSource.INTERACTIONS, self._interactions),
            (FeatureSource.QUERY_FEATURES, self._query_features),
            (FeatureSource.ITEM_FEATURES, self._item_features),
        ]

        # resolve missing sources on declared features
        for f in completed:
            if f.feature_source is None:
                if f.column == query_col or f.column == item_col:
                    f._set_feature_source(FeatureSource.INTERACTIONS)
                    continue
                for source, frame in source_frames:
                    if frame is not None and f.column in frame.columns:
                        f._set_feature_source(source)
                        break

        # undeclared columns are numerical by default
        for source, frame in source_frames:
            if frame is None:
                continue
            for col in frame.columns:
                if col in known or col in (query_col, item_col):
                    continue
                known.add(col)
                completed.append(
                    FeatureInfo(column=col, feature_type=FeatureType.NUMERICAL, feature_source=source)
                )

        result = FeatureSchema(completed)
        for f in result.all_features:
            if f.feature_type in (FeatureType.CATEGORICAL, FeatureType.CATEGORICAL_LIST):
                src = f.feature_source or FeatureSource.INTERACTIONS
                f._set_cardinality_callback(self._cardinality_callback(src))
        return result

    # -- consistency checks -----------------------------------------------------------
    def _check_ids_consistency(self, hint: FeatureHint) -> None:
        if hint == FeatureHint.QUERY_ID:
            col = self._feature_schema.query_id_column
            frame = self._query_features
        else:
            col = self._feature_schema.item_id_column
            frame = self._item_features
        assert frame is not None
        if col not in frame.columns:
            msg = f"Feature frame for {hint} lacks the id column '{col}'."
            raise ValueError(msg)
        interaction_ids = set(pd.unique(self._interactions[col]))
        feature_ids = set(pd.unique(frame[col]))
        missing = interaction_ids - feature_ids
        if missing:
            msg = (
                f"Ids consistency error for {hint.value}: {len(missing)} ids present in "
                "interactions are missing from the feature frame."
            )
            raise ValueError(msg)

    def _check_encoded(self) -> None:
        for f in self._feature_schema.all_features:
            if f.feature_type != FeatureType.CATEGORICAL:
                continue
            if f.feature_hint not in (FeatureHint.QUERY_ID, FeatureHint.ITEM_ID):
                continue
            frames = [self._interactions]
            if f.feature_hint == FeatureHint.QUERY_ID and self._query_features is not None:
                frames.append(self._query_features)
            if f.feature_hint == FeatureHint.ITEM_ID and self._item_features is not None:
                frames.append(self._item_features)
            for frame in frames:
                if f.column not in frame.columns:
                    continue
                col = frame[f.column]
                if not pd.api.types.is_integer_dtype(col):
                    msg = f"Column '{f.column}' is declared encoded but is not integer-typed."
                    raise ValueError(msg)
                if len(col) and int(col.min()) < 0:
                    msg = f"Column '{f.column}' is declared encoded but contains negative ids."
                    raise ValueError(msg)


def nunique(data: pd.DataFrame, column: str) -> int:
    """Number of distinct values in a column."""
    return int(data[column].nunique())


def select(data: pd.DataFrame, columns: Sequence[str]) -> pd.DataFrame:
    """Project a dataframe onto the given columns."""
    return data[list(columns)]
