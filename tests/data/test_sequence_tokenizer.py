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
