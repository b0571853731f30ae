"""CatPopRec reference-semantics tests, ported from
/root/reference/tests/models/test_cat_pop_rec.py (exact cat-tree/cat-log
fixtures and ground-truth relevance fractions)."""

import logging

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import CatPopRec


@pytest.fixture()
def cat_tree():
    return pd.DataFrame(
        {
            "parent_cat": [None, None, "groceries", "fruits", "fruits", "apples"],
            "category": ["healthy_food", "groceries", "fruits", "apples", "bananas", "red_apples"],
        }
    )


@pytest.fixture()
def cat_log():
    # item 1 is an apple-banana mix, item 2 is a banana
    return pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "item_id": [1, 2, 1, 1],
            "category": ["red_apples", "bananas", "healthy_food", "bananas"],
            "rating": [5, 1, 3, 2],
        }
    )


REQUESTED = ["healthy_food", "fruits", "red_apples"]


def make_dataset(log, with_rating):
    infos = [
        FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
        FeatureInfo("category", FeatureType.CATEGORICAL),
    ]
    if with_rating:
        infos.append(FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING))
        return Dataset(FeatureSchema(infos), log)
    return Dataset(FeatureSchema(infos), log.drop(columns=["rating"]))


def _as_dict(recs):
    return {
        (row["category"], row["item_id"]): row["rating"]
        for _, row in recs.iterrows()
    }


def test_cat_tree_closure(cat_tree):
    """category → leaf descendants (reference test_cat_tree: 8 rows,
    groceries expands to {red_apples, bananas})."""
    model = CatPopRec(cat_tree)
    mapping = model.leaf_cat_mapping
    assert len(mapping) == 8
    healthy = mapping[mapping["category"] == "healthy_food"]
    assert healthy["leaf_cat"].tolist() == ["healthy_food"]
    groceries = sorted(mapping[mapping["category"] == "groceries"]["leaf_cat"])
    assert groceries == ["bananas", "red_apples"]


def test_works_no_rel(cat_tree, cat_log):
    model = CatPopRec(cat_tree)
    model.fit(make_dataset(cat_log, with_rating=False))
    got = _as_dict(model.predict(REQUESTED, k=3))
    want = {
        ("red_apples", 1): 1.0,
        ("healthy_food", 1): 1.0,
        ("fruits", 1): 2 / 3,
        ("fruits", 2): 1 / 3,
    }
    assert set(got) == set(want)
    for key, val in want.items():
        assert got[key] == pytest.approx(val)


def test_works_rel(cat_tree, cat_log):
    model = CatPopRec(cat_tree)
    model.fit(make_dataset(cat_log, with_rating=True))
    got = _as_dict(model.predict(REQUESTED, k=3))
    want = {
        ("red_apples", 1): 1.0,
        ("healthy_food", 1): 1.0,
        ("fruits", 1): 7 / 8,
        ("fruits", 2): 1 / 8,
    }
    assert set(got) == set(want)
    for key, val in want.items():
        assert got[key] == pytest.approx(val)


def test_set_cat_tree_idempotent(cat_tree):
    model = CatPopRec(cat_tree)
    before = model.leaf_cat_mapping.sort_values(["category", "leaf_cat"]).reset_index(drop=True)
    model.set_cat_tree(cat_tree)
    after = model.leaf_cat_mapping.sort_values(["category", "leaf_cat"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_max_iter_warning(cat_tree, caplog):
    with caplog.at_level(logging.WARNING):
        CatPopRec(cat_tree, max_iter=1)
    assert any("not fully processed" in r.getMessage() for r in caplog.records)


def test_predict_cold_items_ignored(cat_tree, cat_log, caplog):
    model = CatPopRec(cat_tree)
    model.fit(make_dataset(cat_log, with_rating=False))
    with caplog.at_level(logging.INFO):
        recs = model.predict(REQUESTED, k=3, items=[1, 1, 2, 3])
    assert any("cold items" in r.message for r in caplog.records)
    assert 3 not in set(recs["item_id"])  # item 3 never seen → dropped
    # warm subset unchanged
    assert set(recs["item_id"]) <= {1, 2}
