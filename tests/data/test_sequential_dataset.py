"""Tests for TensorSchema and SequentialDataset."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.data.schema import FeatureHint, FeatureSource

N_ITEMS = 20
PAD = N_ITEMS


@pytest.fixture()
def schema():
    return TensorSchema(
        [
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                cardinality=N_ITEMS,
                embedding_dim=8,
                padding_value=PAD,
            ),
            TensorFeatureInfo(
                "rating",
                TensorFeatureType.NUMERICAL,
                is_seq=True,
                feature_hint=FeatureHint.RATING,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "rating")],
            ),
        ]
    )


@pytest.fixture()
def log():
    return pd.DataFrame(
        {
            "query_id": [1, 1, 1, 2, 2, 3],
            "item_id": [5, 3, 7, 1, 2, 9],
            "rating": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "timestamp": [0, 1, 2, 1, 0, 5],
        }
    )


class TestTensorSchema:
    def test_roundtrip_args(self, schema):
        restored = TensorSchema._create_object_by_args(schema._get_object_args())
        assert restored == schema

    def test_filters(self, schema):
        assert schema.item_id_feature_name == "item_id"
        assert schema.categorical_features.names == ["item_id"]
        assert schema.numerical_features.names == ["rating"]
        assert schema.sequential_features.names == ["item_id", "rating"]
        assert schema["item_id"].is_cat and not schema["item_id"].is_num

    def test_cardinality_validation(self):
        with pytest.raises(ValueError):
            TensorFeatureInfo("x", TensorFeatureType.NUMERICAL, cardinality=5)
        with pytest.raises(ValueError):
            TensorFeatureInfo("x", TensorFeatureType.CATEGORICAL, tensor_dim=5)


class TestSequentialDataset:
    def test_grouping_sorts_by_timestamp(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        assert len(ds) == 3
        np.testing.assert_array_equal(ds.get_sequence(0, "item_id"), [5, 3, 7])
        # query 2's items ordered by timestamp: item 2 (t=0) then item 1 (t=1)
        np.testing.assert_array_equal(ds.get_sequence(1, "item_id"), [2, 1])
        assert ds.max_len == 3

    def test_left_padding(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        batch = ds.pad_batch(np.array([0, 1]), max_sequence_length=4)
        np.testing.assert_array_equal(batch["item_id"][0], [PAD, 5, 3, 7])
        np.testing.assert_array_equal(batch["item_id"][1], [PAD, PAD, 2, 1])
        np.testing.assert_array_equal(batch["padding_mask"][0], [0, 1, 1, 1])
        np.testing.assert_array_equal(batch["seq_len"], [3, 2])

    def test_truncates_to_most_recent(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        batch = ds.pad_batch(np.array([0]), max_sequence_length=2)
        np.testing.assert_array_equal(batch["item_id"][0], [3, 7])

    def test_static_batch_shapes_with_mask(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        batches = list(ds.batches(batch_size=2, max_sequence_length=4))
        assert len(batches) == 2
        for b in batches:
            assert b["item_id"].shape == (2, 4)
        np.testing.assert_array_equal(batches[1]["batch_mask"], [1, 0])

    def test_replica_sharding_tiles_dataset(self, schema):
        # replica shards must cover all rows, mirroring the reference's
        # partitioning test (tests/data/nn/parquet/partitioning/test_partitioning.py)
        rows = []
        for u in range(10):
            for t in range(3):
                rows.append((u, (u + t) % N_ITEMS, 1.0, t))
        log = pd.DataFrame(rows, columns=["query_id", "item_id", "rating", "timestamp"])
        ds = SequentialDataset.from_interactions(schema, log)
        for num_replicas in (1, 2, 3, 4):
            seen = []
            for replica in range(num_replicas):
                for b in ds.batches(
                    batch_size=2,
                    max_sequence_length=4,
                    replica_id=replica,
                    num_replicas=num_replicas,
                ):
                    seen.extend(b["query_id"][b["batch_mask"].astype(bool)])
            assert set(seen) >= set(range(10))

    def test_deterministic_shuffle(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        a = [b["query_id"].tolist() for b in ds.batches(2, 4, shuffle=True, seed=7, epoch=1)]
        b = [b["query_id"].tolist() for b in ds.batches(2, 4, shuffle=True, seed=7, epoch=1)]
        c = [b["query_id"].tolist() for b in ds.batches(2, 4, shuffle=True, seed=7, epoch=2)]
        assert a == b
        assert a != c or len(ds) <= 2

    def test_filter_and_intersection(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        sub = ds.filter_by_query_id(np.array([1, 3]))
        assert list(sub.query_ids) == [1, 3]
        np.testing.assert_array_equal(sub.get_sequence_by_query_id(3, "item_id"), [9])
        left, right = SequentialDataset.keep_common_query_ids(ds, sub)
        assert list(left.query_ids) == [1, 3]


def _tiny_ds():
    schema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                cardinality=10,
                embedding_dim=8,
                padding_value=10,
            )
        ]
    )
    log = pd.DataFrame(
        {
            "query_id": [0, 0, 0, 2, 2, 5],
            "item_id": [1, 2, 3, 4, 5, 6],
            "timestamp": [0, 1, 2, 0, 1, 0],
        }
    )
    return SequentialDataset.from_interactions(schema, log)


def test_padded_sequences_vectorized_matches_per_row():
    ds = _tiny_ds()
    qids = np.array([2, 0, 5, 7])  # 7 is absent
    out, lens = ds.padded_sequences(qids, "item_id", length=4, pad_value=-1)
    np.testing.assert_array_equal(lens, [2, 3, 1, 0])
    np.testing.assert_array_equal(out[0], [4, 5, -1, -1])
    np.testing.assert_array_equal(out[1], [1, 2, 3, -1])
    np.testing.assert_array_equal(out[2], [6, -1, -1, -1])
    np.testing.assert_array_equal(out[3], [-1, -1, -1, -1])


def test_padded_sequences_truncates_to_length():
    ds = _tiny_ds()
    out, lens = ds.padded_sequences(np.array([0]), "item_id", length=2)
    np.testing.assert_array_equal(out[0], [1, 2])
    np.testing.assert_array_equal(lens, [2])


class TestReferenceNamedSurface:
    def test_reference_accessors(self, schema, log):
        ds = SequentialDataset.from_interactions(schema, log)
        assert ds.get_query_id(0) == 1
        np.testing.assert_array_equal(ds.get_all_query_ids(), [1, 2, 3])
        assert ds.get_sequence_length(0) == 3
        assert ds.get_max_sequence_length() == 3

    def test_save_load_roundtrip(self, schema, log, tmp_path):
        ds = SequentialDataset.from_interactions(schema, log)
        ds.save(str(tmp_path / "seqds"))
        back = SequentialDataset.load(str(tmp_path / "seqds"))
        np.testing.assert_array_equal(back.query_ids, ds.query_ids)
        assert back.schema.names == ds.schema.names
        for q in (0, 1, 2):
            np.testing.assert_array_equal(
                back.get_sequence(q, "item_id"), ds.get_sequence(q, "item_id")
            )
            np.testing.assert_array_equal(
                back.get_sequence(q, "rating"), ds.get_sequence(q, "rating")
            )
