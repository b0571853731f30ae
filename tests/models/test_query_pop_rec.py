"""QueryPopRec reference-semantics tests (reference:
replay/models/query_pop_rec.py doctest semantics + tests/models/
test_all_models.py membership): per-query popularity fractions, recs drawn
only from the query's own history."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import QueryPopRec


def make_dataset(df):
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    return Dataset(schema, df)


@pytest.fixture()
def ds():
    return make_dataset(
        pd.DataFrame(
            {
                "user_id": [0, 0, 0, 1, 1, 2, 2, 2],
                "item_id": [0, 1, 1, 2, 0, 1, 1, 2],
                "rating": [1.0, 2.0, 2.0, 3.0, 1.0, 5.0, 5.0, 2.0],
            }
        )
    )


def test_popularity_fractions(ds):
    """Popularity(i|u) = rating_sum(u, i) / rating_sum(u) — the reference
    doctest formula (replay/models/query_pop_rec.py)."""
    model = QueryPopRec()
    model.fit(ds)
    pop = model.query_item_popularity.set_index(["user_id", "item_id"])["rating"]
    assert pop[(0, 0)] == pytest.approx(1 / 5)
    assert pop[(0, 1)] == pytest.approx(4 / 5)
    assert pop[(1, 0)] == pytest.approx(1 / 4)
    assert pop[(1, 2)] == pytest.approx(3 / 4)
    assert pop[(2, 1)] == pytest.approx(10 / 12)
    assert pop[(2, 2)] == pytest.approx(2 / 12)


def test_recs_come_from_own_history(ds):
    model = QueryPopRec()
    model.fit(ds)
    recs = model.predict(ds, k=2, filter_seen_items=False)
    log = ds.interactions
    seen = log.groupby("user_id")["item_id"].agg(set)
    for _, row in recs.iterrows():
        assert row["item_id"] in seen[row["user_id"]]
    # ranked by per-query popularity: top-1 of user 0 is item 1
    top0 = recs[recs["user_id"] == 0].sort_values("rating", ascending=False).iloc[0]
    assert top0["item_id"] == 1


def test_predict_pairs_inner_join(ds):
    """Pairs outside a query's history are dropped (reference join-fallback
    semantics, replay/models/base_rec.py:569-585)."""
    model = QueryPopRec()
    model.fit(ds)
    pairs = pd.DataFrame({"user_id": [0, 0, 1], "item_id": [1, 2, 2]})
    res = model.predict_pairs(pairs, ds)
    got = set(map(tuple, res[["user_id", "item_id"]].values))
    assert got == {(0, 1), (1, 2)}  # (0, 2) never interacted → dropped


def test_save_load_roundtrip(ds, tmp_path):
    from replay_tpu.utils.model_handler import load, save

    model = QueryPopRec()
    model.fit(ds)
    save(model, str(tmp_path / "qpr"))
    restored = load(str(tmp_path / "qpr"))
    pd.testing.assert_frame_equal(
        restored.query_item_popularity.sort_values(["user_id", "item_id"]).reset_index(drop=True),
        model.query_item_popularity.sort_values(["user_id", "item_id"]).reset_index(drop=True),
    )
