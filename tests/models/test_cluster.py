"""ClusterRec reference-semantics tests, ported from
/root/reference/tests/models/test_cluster.py on the reference's
long/short_log_with_features + user_features fixtures."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import ClusterRec


def long_log():
    rows = [
        (0, 0, 1.0), (0, 3, 3.0), (0, 1, 2.0), (0, 4, 4.0),
        (1, 0, 4.0), (1, 2, 2.0), (1, 6, 4.0), (1, 7, 4.0),
        (2, 8, 3.0), (2, 1, 2.0), (2, 5, 1.0), (2, 6, 5.0),
    ]
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])


def user_features():
    # the reference's `user_features` with the categorical gender dropped
    return pd.DataFrame(
        {"user_id": [0, 1, 2], "age": [20.0, 30.0, 75.0], "mood": [-3.0, 4.0, -1.0]}
    )


def make_dataset(log, features=None):
    schema_infos = [
        FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
        FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
    ]
    if features is not None:
        schema_infos += [
            FeatureInfo("age", FeatureType.NUMERICAL, feature_source=None),
            FeatureInfo("mood", FeatureType.NUMERICAL, feature_source=None),
        ]
    return Dataset(
        FeatureSchema(schema_infos), log, query_features=features,
        check_consistency=False,
    )


def test_works_and_optimizes():
    model = ClusterRec()
    ds = make_dataset(long_log(), user_features())
    model.fit(ds)
    recs = model.predict(ds, k=1)
    assert recs.groupby("user_id").size().le(1).all()
    res = model.optimize(ds, ds, budget=1)
    assert isinstance(res["num_clusters"], int)


def test_cold_user_gets_cluster_recs():
    """Reference test_cold_user: a user known only through features (not in
    the train log) must still get k recs with non-null relevance."""
    model = ClusterRec(2)
    train = long_log()[long_log()["user_id"] < 2]
    ds = make_dataset(train, user_features())  # features include user 2
    model.fit(ds)
    res = model.predict(ds, 2, queries=[1])
    assert len(res) == 2
    assert set(res["user_id"]) == {1}
    assert res["rating"].notna().all()


def test_predict_pairs():
    model = ClusterRec()
    ds = make_dataset(long_log(), user_features())
    model.fit(ds)
    pairs = long_log()[long_log()["user_id"] == 1][["user_id", "item_id"]]
    res = model.predict_pairs(pairs, dataset=ds)
    assert len(res) == 4
    assert set(res["user_id"]) == {1}
    pd.testing.assert_frame_equal(
        res[["user_id", "item_id"]].sort_values("item_id").reset_index(drop=True),
        pairs.sort_values("item_id").reset_index(drop=True),
    )


def test_predict_without_features_raises():
    model = ClusterRec()
    ds = make_dataset(long_log(), user_features())
    model.fit(ds)
    bare = make_dataset(long_log())
    with pytest.raises(ValueError, match="features"):
        model.predict(bare, k=1)
    pairs = long_log()[long_log()["user_id"] == 1][["user_id", "item_id"]]
    with pytest.raises(ValueError, match="features"):
        model.predict_pairs(pairs, dataset=bare)


def test_predict_empty_log():
    model = ClusterRec()
    ds = make_dataset(long_log(), user_features())
    model.fit(ds)
    empty = make_dataset(long_log().iloc[:0], user_features())
    model.predict(empty, k=1)  # must not raise
