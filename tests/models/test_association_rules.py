"""AssociationRulesItemRec reference-semantics tests, ported from
/root/reference/tests/models/test_association_rules.py (exact fixture +
hand-recomputed formula expectations from replay/models/association_rules.py
confidence/lift/confidence_gain definitions)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import AssociationRulesItemRec


def reference_log() -> pd.DataFrame:
    """The reference suite's shared `log` fixture (tests/conftest.py:52)."""
    rows = [
        (0, 0, "2019-08-22", 4.0),
        (0, 2, "2019-08-23", 3.0),
        (0, 1, "2019-08-27", 2.0),
        (1, 3, "2019-08-24", 3.0),
        (1, 0, "2019-08-25", 4.0),
        (2, 1, "2019-08-26", 5.0),
        (2, 0, "2019-08-26", 5.0),
        (2, 2, "2019-08-26", 3.0),
        (3, 1, "2019-08-26", 5.0),
        (3, 0, "2019-08-26", 5.0),
        (3, 0, "2019-08-26", 1.0),
    ]
    frame = pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp", "rating"])
    frame["timestamp"] = pd.to_datetime(frame["timestamp"])
    return frame


def make_dataset(df):
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    return Dataset(schema, df)


@pytest.fixture(scope="module")
def model():
    model = AssociationRulesItemRec(
        min_item_count=1, min_pair_count=1, session_column="user_id"
    )
    model.fit(make_dataset(reference_log()))
    return model


def _rule(model, ant, con):
    rules = model.get_item_to_item_rules()
    row = rules[(rules["item_idx_one"] == ant) & (rules["item_idx_two"] == con)]
    assert len(row) == 1
    return row.iloc[0]


def check_formulas(row, count_ant, count_cons, pair_count, num_sessions):
    """The reference test's exact recomputation (test_association_rules.py:35)."""
    confidence = pair_count / count_ant
    confidence_not_ant = (count_cons - pair_count) / (num_sessions - count_ant)
    assert row["confidence"] == pytest.approx(confidence)
    assert row["lift"] == pytest.approx(confidence / (count_cons / num_sessions))
    assert row["confidence_gain"] == pytest.approx(confidence / confidence_not_ant)


def test_calculation(model):
    # antecedent item 2, consequent item 1: 2 sessions hold item 2, 3 hold
    # item 1, both co-occur in sessions {0, 2}; 4 sessions total
    check_formulas(_rule(model, 2, 1), count_ant=2, count_cons=3, pair_count=2, num_sessions=4)
    row = _rule(model, 2, 1)
    assert row["confidence"] == pytest.approx(1.0)
    assert row["lift"] == pytest.approx(4 / 3)
    assert row["confidence_gain"] == pytest.approx(2.0)


def test_calculation_with_weights(model):
    weighted = AssociationRulesItemRec(
        min_item_count=1, min_pair_count=1, use_rating=True, session_column="user_id"
    )
    weighted.fit(make_dataset(reference_log()))
    # rating-weighted counts (reference test values): ant=Σr(item2)=6,
    # cons=Σr(item1)=12, pair=Σ min(r2, r1)=min(3,2)+min(3,5)=5
    check_formulas(
        _rule(weighted, 2, 1), count_ant=6, count_cons=12, pair_count=5, num_sessions=4
    )


def test_invalid_metric_raises(model):
    with pytest.raises(ValueError, match="metric"):
        model.get_nearest_items([0], k=1, metric="invalid")


def test_similarity_metric_setter_raises(model):
    with pytest.raises(ValueError, match="similarity_metric"):
        model.similarity_metric = "invalid"


def test_invalid_init_metric_raises():
    with pytest.raises(ValueError, match="similarity_metric"):
        AssociationRulesItemRec(similarity_metric="invalid")


def test_get_nearest_items(model):
    # reference test: confidence_gain of item 1 for antecedent 2 is 2.0;
    # with candidates=[1, 3] only item 1 qualifies (no 2→3 rule)
    res = model.get_nearest_items(items=[2], k=10, metric="confidence_gain")
    res_cand = res[res["neighbour_item_idx"].isin([1, 3])]
    assert len(res_cand) == 1
    assert float(res_cand.iloc[0]["similarity"]) == pytest.approx(2.0)
    res_lift = model.get_nearest_items(items=[2], k=10, metric="lift")
    assert len(res_lift) == 2  # items 0 and 1 co-occur with 2


def test_metric_switch_changes_predictions(model):
    """similarity_metric init value vs post-hoc setter must agree, and lift
    vs confidence must differ (reference test_metric)."""
    ds = make_dataset(reference_log())
    pairs = pd.DataFrame({"user_id": [0, 1], "item_id": [1, 0]})

    init_conf = AssociationRulesItemRec(
        min_item_count=1, min_pair_count=1, session_column="user_id",
        similarity_metric="confidence",
    )
    init_conf.fit(ds)
    pred_init = init_conf.predict_pairs(pairs, ds)

    switched = AssociationRulesItemRec(
        min_item_count=1, min_pair_count=1, session_column="user_id",
        similarity_metric="lift",
    )
    switched.fit(ds)
    switched.similarity_metric = "confidence"
    pred_switched = switched.predict_pairs(pairs, ds)
    pd.testing.assert_frame_equal(
        pred_init.reset_index(drop=True), pred_switched.reset_index(drop=True)
    )

    switched.similarity_metric = "lift"
    pred_lift = switched.predict_pairs(pairs, ds)
    assert not np.allclose(
        pred_switched["rating"].to_numpy(), pred_lift["rating"].to_numpy()
    )


def test_min_pair_count_filters_rules():
    model = AssociationRulesItemRec(
        min_item_count=1, min_pair_count=3, session_column="user_id"
    )
    model.fit(make_dataset(reference_log()))
    rules = model.get_item_to_item_rules()
    # only the (0, 1) pair co-occurs in 3 sessions
    assert set(map(tuple, rules[["item_idx_one", "item_idx_two"]].values)) == {
        (0, 1),
        (1, 0),
    }


def test_num_neighbours_caps_rules():
    model = AssociationRulesItemRec(
        min_item_count=1, min_pair_count=1, session_column="user_id", num_neighbours=1
    )
    model.fit(make_dataset(reference_log()))
    per_ant = model.get_item_to_item_rules().groupby("item_idx_one").size()
    assert (per_ant <= 1).all()
