"""Discretizer, Sessionizer, CSRConverter, merge_subsets, DatasetLabelEncoder tests."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.dataset_utils import DatasetLabelEncoder
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.preprocessing import (
    CSRConverter,
    Discretizer,
    GreedyDiscretizingRule,
    QuantileDiscretizingRule,
    Sessionizer,
    merge_subsets,
)


class TestDiscretizer:
    def test_quantile_rule_balanced_bins(self):
        df = pd.DataFrame({"x": np.arange(100, dtype=float)})
        rule = QuantileDiscretizingRule("x", n_bins=4)
        out = rule.fit_transform(df)
        counts = out["x"].value_counts().sort_index()
        assert list(counts.index) == [0, 1, 2, 3]
        assert counts.min() >= 24

    def test_greedy_rule_bins(self):
        df = pd.DataFrame({"x": np.repeat(np.arange(10, dtype=float), 10)})
        rule = GreedyDiscretizingRule("x", n_bins=5, min_data_in_bin=10)
        out = rule.fit_transform(df)
        assert out["x"].nunique() <= 6
        assert out["x"].min() == 0

    def test_handle_invalid_keep_skip_error(self):
        df = pd.DataFrame({"x": [1.0, 2.0, np.nan, 4.0]})
        keep = QuantileDiscretizingRule("x", n_bins=2, handle_invalid="keep").fit_transform(df)
        assert keep["x"].iloc[2] == 2  # extra bucket = n_bins
        skip = QuantileDiscretizingRule("x", n_bins=2, handle_invalid="skip").fit_transform(df)
        assert len(skip) == 3
        with pytest.raises(ValueError):
            QuantileDiscretizingRule("x", n_bins=2, handle_invalid="error").fit_transform(df)

    def test_discretizer_multi_column_and_save_load(self, tmp_path):
        df = pd.DataFrame(
            {"a": np.linspace(0, 1, 50), "b": np.linspace(10, 20, 50)}
        )
        disc = Discretizer(
            [QuantileDiscretizingRule("a", 3), GreedyDiscretizingRule("b", 4)]
        )
        out = disc.fit_transform(df)
        assert out["a"].max() <= 3 and out["b"].max() <= 4
        disc.save(str(tmp_path))
        restored = Discretizer.load(str(tmp_path))
        out2 = restored.transform(df)
        pd.testing.assert_frame_equal(out, out2)

    def test_duplicate_columns_rejected(self):
        with pytest.raises(ValueError):
            Discretizer([QuantileDiscretizingRule("a", 2), GreedyDiscretizingRule("a", 2)])


class TestSessionizer:
    def test_reference_doctest_case(self):
        """Exact session ids from the reference doctest
        (replay/preprocessing/sessionizer.py:18-47)."""
        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 3, 3],
                "item_id": [3, 7, 10, 5, 8, 11, 4, 9, 2, 5],
                "timestamp": [1, 2, 3, 3, 2, 1, 3, 12, 1, 4],
            }
        )
        out = Sessionizer(session_gap=5).transform(df)
        assert list(out["session_id"]) == [2, 2, 2, 5, 5, 5, 9, 8, 9, 9]

    def test_session_filters(self):
        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2],
                "item_id": [1, 2, 3, 4],
                "timestamp": [1, 2, 100, 1],
            }
        )
        out = Sessionizer(session_gap=50, min_inter_per_session=2).transform(df)
        # only user 1's first session (2 interactions) survives
        assert len(out) == 2
        assert set(out["user_id"]) == {1}

    def test_datetime_column(self):
        df = pd.DataFrame(
            {
                "user_id": [1, 1],
                "item_id": [1, 2],
                "timestamp": pd.to_datetime(["2024-01-01", "2024-01-03"]),
            }
        )
        out = Sessionizer(session_gap=86400).transform(df)
        assert out["session_id"].nunique() == 2


class TestCSRConverter:
    def test_reference_doctest_case(self):
        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 3, 3],
                "item_id": [3, 7, 10, 5, 8, 11, 4, 9, 2, 5],
                "rating": [1, 2, 3, 3, 2, 1, 3, 12, 1, 4],
            }
        )
        mat = CSRConverter("user_id", "item_id", "rating").transform(df)
        assert mat.shape == (4, 12)
        assert mat[1, 3] == 1 and mat[3, 9] == 12 and mat[2, 5] == 3

    def test_default_ones_and_fixed_shape(self):
        df = pd.DataFrame({"u": [0, 1], "i": [1, 0]})
        mat = CSRConverter("u", "i", row_count=5, column_count=5).transform(df)
        assert mat.shape == (5, 5)
        assert mat.sum() == 2


class TestMergeSubsets:
    def test_merge_and_duplicate_strategies(self):
        a = pd.DataFrame({"x": [1, 2], "y": [10, 20]})
        b = pd.DataFrame({"y": [20, 30], "x": [2, 3]})
        merged = merge_subsets([a, b], on_duplicate="ignore")
        assert len(merged) == 4
        with pytest.raises(ValueError):
            merge_subsets([a, b], on_duplicate="error")
        dropped = merge_subsets([a, b], on_duplicate="drop")
        assert len(dropped) == 3

    def test_column_mismatch(self):
        a = pd.DataFrame({"x": [1]})
        b = pd.DataFrame({"z": [1]})
        with pytest.raises(ValueError):
            merge_subsets([a, b])


class TestDatasetLabelEncoder:
    def make_dataset(self):
        inter = pd.DataFrame(
            {
                "user_id": ["u1", "u2", "u1"],
                "item_id": ["iA", "iB", "iB"],
                "rating": [1.0, 2.0, 3.0],
            }
        )
        qf = pd.DataFrame({"user_id": ["u1", "u2"], "segment": ["a", "b"]})
        schema = FeatureSchema(
            [
                FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
                FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
                FeatureInfo(
                    "rating",
                    FeatureType.NUMERICAL,
                    feature_hint=FeatureHint.RATING,
                    feature_source=FeatureSource.INTERACTIONS,
                ),
                FeatureInfo(
                    "segment", FeatureType.CATEGORICAL, feature_source=FeatureSource.QUERY_FEATURES
                ),
            ]
        )
        return Dataset(schema, inter, query_features=qf)

    def test_fit_transform_encodes_everything(self):
        ds = self.make_dataset()
        encoder = DatasetLabelEncoder()
        encoded = encoder.fit_transform(ds)
        assert encoded.is_categorical_encoded
        assert encoded.interactions["user_id"].dtype.kind in "iu"
        assert encoded.interactions["item_id"].dtype.kind in "iu"
        assert encoded.query_features["segment"].dtype.kind in "iu"

    def test_role_encoders_roundtrip(self):
        ds = self.make_dataset()
        encoder = DatasetLabelEncoder().fit(ds)
        qenc = encoder.query_id_encoder
        frame = pd.DataFrame({"user_id": ["u2", "u1"]})
        enc = qenc.transform(frame)
        back = qenc.inverse_transform(enc)
        assert list(back["user_id"]) == ["u2", "u1"]

    def test_unfitted_raises(self):
        with pytest.raises(RuntimeError):
            _ = DatasetLabelEncoder().query_id_encoder
