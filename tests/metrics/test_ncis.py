"""NCISPrecision tests."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.metrics import NCISPrecision, Precision


def frames():
    recs = pd.DataFrame(
        {
            "query_id": [0, 0, 0, 1, 1, 1],
            "item_id": [1, 2, 3, 1, 2, 3],
            "rating": [3.0, 2.0, 1.0, 3.0, 2.0, 1.0],
        }
    )
    gt = pd.DataFrame({"query_id": [0, 1], "item_id": [1, 3]})
    return recs, gt


def test_uniform_weights_match_plain_precision():
    """With identical current and logging policies, all weights = 1 →
    NCIS precision equals plain precision."""
    recs, gt = frames()
    prev = recs.copy()
    ncis = NCISPrecision(2, prev_policy_weights=prev)(recs, gt)
    plain = Precision(2)(recs, gt)
    np.testing.assert_allclose(
        list(ncis.values())[0], list(plain.values())[0]
    )


def test_weighting_shifts_value():
    recs, gt = frames()
    # logging policy strongly preferred item 2 (the miss) → its weight
    # shrinks relative weights of hits change the precision
    prev = recs.copy()
    prev.loc[prev["item_id"] == 2, "rating"] = 30.0
    ncis = NCISPrecision(2, prev_policy_weights=prev, threshold=10.0)(recs, gt)
    plain = Precision(2)(recs, gt)
    # query 0: hit item1 w=1, miss item2 w=2/30 → precision ≈ 1*1/(1+1/15)
    assert list(ncis.values())[0] != list(plain.values())[0]
    v = list(ncis.values())[0]
    assert 0 <= v <= 1


def test_threshold_caps_weights():
    recs, gt = frames()
    prev = recs.copy()
    prev["rating"] = 1e-6  # ratio explodes → capped at threshold
    ncis = NCISPrecision(2, prev_policy_weights=prev, threshold=5.0)(recs, gt)
    plain = Precision(2)(recs, gt)
    # all weights equal (capped) → same as plain
    np.testing.assert_allclose(list(ncis.values())[0], list(plain.values())[0])


def test_activation_softmax_runs():
    recs, gt = frames()
    ncis = NCISPrecision(
        [1, 2], prev_policy_weights=recs, activation="softmax"
    )(recs, gt)
    assert set(ncis) == {"NCISPrecision@1", "NCISPrecision@2"}
    with pytest.raises(ValueError):
        NCISPrecision(1, prev_policy_weights=recs, activation="bogus")(recs, gt)
