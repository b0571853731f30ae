"""Differential parity: SequenceTokenizer vs the reference's pandas path.

Both tokenizers fit/transform the SAME raw interaction log (with query and
item features) and must produce identical per-query item sequences and
identical per-query feature sequences after encoding.
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")


@pytest.fixture()
def raw_log():
    rng = np.random.default_rng(23)
    n = 600
    df = pd.DataFrame(
        {
            "user_id": rng.choice([f"u{i}" for i in range(40)], n),
            "item_id": rng.choice([f"i{j}" for j in range(60)], n),
            "timestamp": np.arange(n),
            "rating": rng.integers(1, 6, n).astype(float),
        }
    ).drop_duplicates(["user_id", "item_id"])
    item_feats = pd.DataFrame(
        {
            "item_id": [f"i{j}" for j in range(60)],
            "category": rng.choice(["a", "b", "c"], 60),
        }
    )
    return df, item_feats


def _ref_sequences(reference, df, item_feats):
    from replay.data import Dataset, FeatureHint, FeatureSchema, FeatureInfo, FeatureSource, FeatureType
    from replay.data.nn import SequenceTokenizer, TensorFeatureInfo, TensorFeatureSource, TensorSchema

    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
            FeatureInfo("category", FeatureType.CATEGORICAL, feature_source=FeatureSource.ITEM_FEATURES),
        ]
    )
    dataset = Dataset(schema, df, item_features=item_feats)
    tschema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id",
                FeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            ),
            TensorFeatureInfo(
                "category",
                FeatureType.CATEGORICAL,
                is_seq=True,
                feature_sources=[TensorFeatureSource(FeatureSource.ITEM_FEATURES, "category")],
            ),
        ]
    )
    tok = SequenceTokenizer(tschema).fit(dataset)
    seq = tok.transform(dataset)
    out = {}
    for i in range(len(seq)):
        q = seq.get_query_id(i)
        out[int(q)] = (
            np.asarray(seq.get_sequence(i, "item_id")),
            np.asarray(seq.get_sequence(i, "category")),
        )
    return out, tok


def _our_sequences(df, item_feats):
    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.nn import (
        SequenceTokenizer, TensorFeatureInfo, TensorFeatureSource, TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import (
        FeatureHint, FeatureInfo, FeatureSchema, FeatureSource, FeatureType,
    )

    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
            FeatureInfo("category", FeatureType.CATEGORICAL, feature_source=FeatureSource.ITEM_FEATURES),
        ]
    )
    dataset = Dataset(schema, df, item_features=item_feats)
    tschema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            ),
            TensorFeatureInfo(
                "category",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_sources=[TensorFeatureSource(FeatureSource.ITEM_FEATURES, "category")],
            ),
        ]
    )
    tok = SequenceTokenizer(tschema).fit(dataset)
    seq = tok.transform(dataset)
    out = {}
    for i in range(len(seq)):
        q = seq.query_ids[i]
        out[int(q)] = (
            np.asarray(seq.get_sequence(i, "item_id")),
            np.asarray(seq.get_sequence(i, "category")),
        )
    return out, tok


def test_tokenizer_matches_reference(reference, raw_log):
    df, item_feats = raw_log
    ref, ref_tok = _ref_sequences(reference, df, item_feats)
    ours, our_tok = _our_sequences(df, item_feats)

    assert set(ref) == set(ours)
    for q in ref:
        np.testing.assert_array_equal(ref[q][0], ours[q][0], err_msg=f"items q={q}")
        np.testing.assert_array_equal(ref[q][1], ours[q][1], err_msg=f"category q={q}")

    # assigned cardinalities agree
    assert (
        ref_tok.tensor_schema["item_id"].cardinality
        == our_tok.tensor_schema["item_id"].cardinality
    )
    assert (
        ref_tok.tensor_schema["category"].cardinality
        == our_tok.tensor_schema["category"].cardinality
    )
