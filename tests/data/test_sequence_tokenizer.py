"""SequenceTokenizer tests."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.nn import (
    SequenceTokenizer,
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)


@pytest.fixture()
def raw_dataset():
    log = pd.DataFrame(
        {
            "user_id": ["u1", "u1", "u2", "u2", "u2"],
            "item_id": ["iB", "iA", "iA", "iC", "iB"],
            "timestamp": [1, 0, 0, 2, 1],
        }
    )
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    return Dataset(schema, log)


@pytest.fixture()
def tensor_schema():
    return TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=3,
            embedding_dim=8,
            padding_value=3,
        )
    )


def test_fit_transform_encodes_and_orders(raw_dataset, tensor_schema):
    tokenizer = SequenceTokenizer(tensor_schema)
    seq = tokenizer.fit_transform(raw_dataset)
    assert len(seq) == 2
    # u1's items ordered by timestamp: iA (t=0) then iB (t=1)
    u1_pos = 0  # encoded u1 → 0
    s = seq.get_sequence(u1_pos, "item_id")
    dec = tokenizer.item_id_encoder.inverse_transform(pd.DataFrame({"item_id": s}))
    assert list(dec["item_id"]) == ["iA", "iB"]


def test_encoder_roundtrip(raw_dataset, tensor_schema):
    tokenizer = SequenceTokenizer(tensor_schema).fit(raw_dataset)
    enc = tokenizer.query_id_encoder.transform(pd.DataFrame({"user_id": ["u2"]}))
    back = tokenizer.query_id_encoder.inverse_transform(enc)
    assert list(back["user_id"]) == ["u2"]


def test_unknown_handling(raw_dataset, tensor_schema):
    tokenizer = SequenceTokenizer(tensor_schema, handle_unknown_rule="drop").fit(raw_dataset)
    other = Dataset(
        raw_dataset.feature_schema,
        pd.DataFrame({"user_id": ["u1"], "item_id": ["iNEW"], "timestamp": [9]}),
        check_consistency=False,
    )
    seq = tokenizer.transform(other)
    # unknown item dropped → empty sequence set
    assert seq.max_len == 0 or len(seq) == 0


# ---------------------------------------------------------------- features
# (reference scenarios: tests/data/nn/test_sequence_tokenizer.py:304
# item features, :366 user features, :408 scalar user features,
# :637-787 validation errors, :885 save/load)


@pytest.fixture()
def featured_dataset():
    log = pd.DataFrame(
        {
            "user_id": ["u1", "u1", "u1", "u2", "u2"],
            "item_id": ["iB", "iA", "iC", "iA", "iB"],
            "timestamp": [0, 1, 2, 0, 1],
        }
    )
    item_features = pd.DataFrame(
        {"item_id": ["iA", "iB", "iC"], "genre": ["g1", "g2", "g1"], "price": [1.0, 2.0, 3.0]}
    )
    query_features = pd.DataFrame({"user_id": ["u1", "u2"], "segment": ["s1", "s2"]})
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "genre", FeatureType.CATEGORICAL, feature_source=FeatureSource.ITEM_FEATURES
            ),
            FeatureInfo(
                "price", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES
            ),
            FeatureInfo(
                "segment", FeatureType.CATEGORICAL, feature_source=FeatureSource.QUERY_FEATURES
            ),
        ]
    )
    return Dataset(schema, log, query_features=query_features, item_features=item_features)


def _feat(name, ftype, source, **kw):
    return TensorFeatureInfo(
        name, ftype, is_seq=kw.pop("is_seq", True),
        feature_sources=[TensorFeatureSource(source, kw.pop("column", name))], **kw
    )


@pytest.fixture()
def featured_tensor_schema():
    return TensorSchema(
        [
            TensorFeatureInfo(
                "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                embedding_dim=8,
            ),
            _feat("genre", TensorFeatureType.CATEGORICAL, FeatureSource.ITEM_FEATURES,
                  embedding_dim=4),
            _feat("price", TensorFeatureType.NUMERICAL, FeatureSource.ITEM_FEATURES),
            _feat("segment", TensorFeatureType.CATEGORICAL, FeatureSource.QUERY_FEATURES,
                  embedding_dim=4),
        ]
    )


class TestFeatureSources:
    def test_item_features_grouped_as_sequences(self, featured_dataset, featured_tensor_schema):
        tok = SequenceTokenizer(featured_tensor_schema)
        seq = tok.fit_transform(featured_dataset)
        # u1 items ordered by ts: iB, iA, iC → genres g2, g1, g1 → encoded
        genre_enc = {
            v: i for i, v in enumerate(
                tok.item_features_encoder.mapping["genre"]
            )
        } if tok.item_features_encoder else None
        u1 = tok.query_id_encoder.mapping["user_id"]["u1"]
        got = seq.get_sequence_by_query_id(u1, "genre")
        assert len(got) == 3
        # genre sequence aligns with the item sequence
        items = seq.get_sequence_by_query_id(u1, "item_id")
        assert len(items) == 3

    def test_numerical_item_feature_sequence(self, featured_dataset, featured_tensor_schema):
        tok = SequenceTokenizer(featured_tensor_schema)
        seq = tok.fit_transform(featured_dataset)
        u1 = tok.query_id_encoder.mapping["user_id"]["u1"]
        prices = seq.get_sequence_by_query_id(u1, "price")
        # iB, iA, iC prices = 2.0, 1.0, 3.0 (time order)
        np.testing.assert_allclose(prices, [2.0, 1.0, 3.0])

    def test_query_feature_broadcast_per_event(self, featured_dataset, featured_tensor_schema):
        tok = SequenceTokenizer(featured_tensor_schema)
        seq = tok.fit_transform(featured_dataset)
        u2 = tok.query_id_encoder.mapping["user_id"]["u2"]
        segs = seq.get_sequence_by_query_id(u2, "segment")
        assert len(segs) == 2
        assert len(set(segs.tolist())) == 1  # constant per query

    def test_cardinality_assigned_from_dataset(self, featured_dataset, featured_tensor_schema):
        tok = SequenceTokenizer(featured_tensor_schema)
        tok.fit(featured_dataset)
        assert tok.tensor_schema["item_id"].cardinality == 3
        assert tok.tensor_schema["genre"].cardinality == 2
        assert tok.tensor_schema["segment"].cardinality == 2

    def test_transform_subset(self, featured_dataset, featured_tensor_schema):
        tok = SequenceTokenizer(featured_tensor_schema)
        tok.fit(featured_dataset)
        seq = tok.transform(featured_dataset, tensor_features_to_keep=["item_id"])
        u1 = tok.query_id_encoder.mapping["user_id"]["u1"]
        assert len(seq.get_sequence_by_query_id(u1, "item_id")) == 3
        with pytest.raises(KeyError):
            seq.get_sequence_by_query_id(u1, "genre")


class TestValidation:
    def test_missing_interaction_column(self, featured_dataset):
        schema = TensorSchema(
            [
                TensorFeatureInfo(
                    "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                    feature_hint=FeatureHint.ITEM_ID,
                    feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                ),
                _feat("gone", TensorFeatureType.CATEGORICAL, FeatureSource.INTERACTIONS),
            ]
        )
        with pytest.raises(ValueError, match="Expected column 'gone' in dataset"):
            SequenceTokenizer(schema).fit(featured_dataset)

    def test_missing_query_features_frame(self, raw_dataset):
        schema = TensorSchema(
            [
                TensorFeatureInfo(
                    "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                    feature_hint=FeatureHint.ITEM_ID,
                    feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                ),
                _feat("segment", TensorFeatureType.CATEGORICAL, FeatureSource.QUERY_FEATURES),
            ]
        )
        with pytest.raises(ValueError, match="query features are not specified"):
            SequenceTokenizer(schema).fit(raw_dataset)

    def test_missing_item_feature_column(self, featured_dataset):
        schema = TensorSchema(
            [
                TensorFeatureInfo(
                    "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                    feature_hint=FeatureHint.ITEM_ID,
                    feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                ),
                _feat("brand", TensorFeatureType.CATEGORICAL, FeatureSource.ITEM_FEATURES),
            ]
        )
        with pytest.raises(ValueError, match="in item features data frame"):
            SequenceTokenizer(schema).fit(featured_dataset)

    def test_item_id_mismatch(self, featured_dataset):
        schema = TensorSchema(
            TensorFeatureInfo(
                "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "timestamp")],
            )
        )
        with pytest.raises(ValueError, match="item ID source colum"):
            SequenceTokenizer(schema).fit(featured_dataset)

    def test_source_required(self):
        with pytest.raises(ValueError, match="sources defined"):
            SequenceTokenizer(
                TensorSchema(
                    TensorFeatureInfo(
                        "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                        feature_hint=FeatureHint.ITEM_ID, cardinality=3,
                    )
                )
            )


class TestSaveLoad:
    @pytest.mark.parametrize("use_pickle", [False, True])
    def test_roundtrip(self, featured_dataset, featured_tensor_schema, tmp_path, use_pickle):
        tok = SequenceTokenizer(featured_tensor_schema)
        before = tok.fit_transform(featured_dataset)
        dst = tmp_path / ("tok.pkl" if use_pickle else "tok")
        tok.save(str(dst), use_pickle=use_pickle)
        restored = SequenceTokenizer.load(str(dst), use_pickle=use_pickle)
        after = restored.transform(featured_dataset)
        u1 = restored.query_id_encoder.mapping["user_id"]["u1"]
        np.testing.assert_array_equal(
            before.get_sequence_by_query_id(u1, "item_id"),
            after.get_sequence_by_query_id(u1, "item_id"),
        )
        assert restored.tensor_schema["genre"].cardinality == 2

    def test_load_with_subset(self, featured_dataset, featured_tensor_schema, tmp_path):
        tok = SequenceTokenizer(featured_tensor_schema)
        tok.fit(featured_dataset)
        tok.save(str(tmp_path / "tok"))
        restored = SequenceTokenizer.load(
            str(tmp_path / "tok"), tensor_features_to_keep=["item_id", "price"]
        )
        assert set(restored.tensor_schema) == {"item_id", "price"}
        seq = restored.transform(featured_dataset)
        u1 = restored.query_id_encoder.mapping["user_id"]["u1"]
        np.testing.assert_allclose(
            seq.get_sequence_by_query_id(u1, "price"), [2.0, 1.0, 3.0]
        )


def test_scalar_query_feature_rides_csr_storage(featured_dataset):
    """is_seq=False query feature: constant per query, surfaces as a [B]
    array at batch time (reference scalar user-feature handling,
    test_sequence_tokenizer.py:408)."""
    schema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                embedding_dim=8,
            ),
            TensorFeatureInfo(
                "segment", TensorFeatureType.CATEGORICAL, is_seq=False,
                feature_sources=[TensorFeatureSource(FeatureSource.QUERY_FEATURES, "segment")],
                embedding_dim=4,
            ),
        ]
    )
    tok = SequenceTokenizer(schema)
    seq = tok.fit_transform(featured_dataset)
    batch = next(seq.batches(batch_size=2, max_sequence_length=4))
    assert batch["item_id"].shape == (2, 4)
    assert batch["segment"].shape == (2,)  # scalar per query
    # u1 -> s1, u2 -> s2 (distinct encoded values)
    assert batch["segment"][0] != batch["segment"][1]
