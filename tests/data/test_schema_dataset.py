import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import (
    Dataset,
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)


def make_schema():
    return FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
        ]
    )


class TestFeatureSchema:
    def test_id_columns(self):
        schema = make_schema()
        assert schema.query_id_column == "user_id"
        assert schema.item_id_column == "item_id"
        assert schema.interactions_rating_column == "rating"
        assert schema.interactions_timestamp_column == "timestamp"

    def test_filter_drop(self):
        schema = make_schema()
        cats = schema.categorical_features
        assert set(cats.columns) == {"user_id", "item_id"}
        dropped = schema.drop(feature_hint=FeatureHint.RATING)
        assert "rating" not in dropped.columns

    def test_subset_and_add(self):
        schema = make_schema()
        sub = schema.subset(["user_id", "item_id"])
        assert len(sub) == 2
        combined = sub + FeatureSchema(
            [FeatureInfo("extra", FeatureType.NUMERICAL)]
        )
        assert "extra" in combined.columns

    def test_duplicate_column_raises(self):
        with pytest.raises(ValueError):
            FeatureSchema(
                [
                    FeatureInfo("a", FeatureType.NUMERICAL),
                    FeatureInfo("a", FeatureType.NUMERICAL),
                ]
            )

    def test_cardinality_non_categorical_raises(self):
        info = FeatureInfo("rating", FeatureType.NUMERICAL)
        with pytest.raises(RuntimeError):
            _ = info.cardinality


class TestDataset:
    def test_basic(self, simple_interactions):
        ds = Dataset(make_schema(), simple_interactions)
        assert ds.query_count == 4
        assert ds.item_count == 4
        assert len(ds.query_ids) == 4
        assert not ds.is_categorical_encoded

    def test_cardinality_callback(self, simple_interactions):
        ds = Dataset(make_schema(), simple_interactions, categorical_encoded=True)
        assert ds.feature_schema.query_id_feature.cardinality == 4
        assert ds.feature_schema.item_id_feature.cardinality == 4

    def test_undeclared_columns_become_numerical(self, simple_interactions):
        df = simple_interactions.copy()
        df["extra"] = 1.0
        ds = Dataset(make_schema(), df)
        assert ds.feature_schema["extra"].feature_type == FeatureType.NUMERICAL
        assert ds.feature_schema["extra"].feature_source == FeatureSource.INTERACTIONS

    def test_feature_consistency_check(self, simple_interactions):
        item_features = pd.DataFrame({"item_id": [0, 1], "genre": [1, 2]})
        with pytest.raises(ValueError):
            Dataset(make_schema(), simple_interactions, item_features=item_features)

    def test_save_load(self, simple_interactions, tmp_path):
        ds = Dataset(make_schema(), simple_interactions)
        ds.save(str(tmp_path / "ds"))
        loaded = Dataset.load(str(tmp_path / "ds"))
        pd.testing.assert_frame_equal(
            loaded.interactions.reset_index(drop=True),
            simple_interactions.reset_index(drop=True),
        )
        assert loaded.feature_schema.query_id_column == "user_id"

    def test_subset(self, simple_interactions):
        ds = Dataset(make_schema(), simple_interactions)
        sub = ds.subset(["user_id", "item_id", "rating"])
        assert "timestamp" not in sub.interactions.columns
        assert sub.feature_schema.query_id_column == "user_id"

    def test_missing_item_id_raises(self, simple_interactions):
        schema = FeatureSchema(
            [FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID)]
        )
        with pytest.raises(ValueError):
            Dataset(schema, simple_interactions)

    def test_encoded_check(self):
        schema = make_schema()
        df = pd.DataFrame(
            {
                "user_id": ["a", "b"],
                "item_id": [0, 1],
                "rating": [1.0, 2.0],
                "timestamp": [0, 1],
            }
        )
        with pytest.raises(ValueError):
            Dataset(schema, df, categorical_encoded=True)


def test_uniform_batching():
    from replay_tpu.data.utils import UniformBatching, get_schema

    batching = UniformBatching(10, 3)
    assert len(batching) == 4
    assert list(batching) == [(0, 3), (3, 6), (6, 9), (9, 10)]
    import pytest

    with pytest.raises(IndexError):
        batching.get_limits(4)
    assert get_schema()["query_id"] == "int64"


def test_state_borg_and_logger():
    from replay_tpu.utils.session import State, logger_with_settings

    State().custom_value = 42
    assert State().custom_value == 42
    logger = logger_with_settings()
    assert logger.name == "replay_tpu"
