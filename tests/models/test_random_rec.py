"""RandomRec reference-semantics tests, ported from
/root/reference/tests/models/test_random_rec.py: exact popularity matrices
per distribution on the reference log, seed-reproducibility across refit
and repeated predict."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import RandomRec


def reference_log():
    rows = [
        (0, 0, 4.0), (0, 2, 3.0), (0, 1, 2.0),
        (1, 3, 3.0), (1, 0, 4.0),
        (2, 1, 5.0), (2, 0, 5.0), (2, 2, 3.0),
        (3, 1, 5.0), (3, 0, 5.0), (3, 0, 1.0),
    ]
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])


def make_dataset(df=None):
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    return Dataset(schema, reference_log() if df is None else df)


PARAMS = [
    pytest.param({"seed": 123}, id="uniform_seed"),
    pytest.param({}, id="uniform_no_seed"),
    pytest.param({"distribution": "popular_based", "seed": 123}, id="popular_based_seed"),
    pytest.param({"distribution": "relevance", "seed": 123}, id="relevance_seed"),
]


@pytest.fixture(params=PARAMS)
def fitted_model(request):
    model = RandomRec(**request.param)
    model.fit(make_dataset())
    return model


def test_popularity_matrix(fitted_model):
    """item_popularity must equal the reference formula per distribution
    (reference test_popularity_matrix), normalized to sum 1."""
    log = reference_log()
    if fitted_model.distribution == "uniform":
        true = pd.Series(1.0, index=sorted(log["item_id"].unique()))
    elif fitted_model.distribution == "popular_based":
        true = log.groupby("item_id")["user_id"].nunique().astype(float)
    else:  # relevance
        true = log.groupby("item_id")["rating"].sum()
    true = true / true.sum()
    got = fitted_model.item_popularity.set_index("item_id")["rating"].sort_index()
    np.testing.assert_allclose(got.to_numpy(), true.sort_index().to_numpy(), rtol=1e-9)


def _frames_equal(a, b):
    a = a.sort_values(["user_id", "item_id"]).reset_index(drop=True)
    b = b.sort_values(["user_id", "item_id"]).reset_index(drop=True)
    return a[["user_id", "item_id"]].equals(b[["user_id", "item_id"]])


def test_predict_reproducibility(fitted_model):
    """Fixed seed → same predictions after refit and on repeated predict;
    no seed → they differ (reference test_predict)."""
    ds = make_dataset()
    pred = fitted_model.predict(ds, k=1)

    fitted_model.fit(ds)
    pred_refit = fitted_model.predict(ds, k=1)
    same_after_refit = _frames_equal(pred, pred_refit)

    pred_repeat = fitted_model.predict(ds, k=1)
    same_on_repeat = _frames_equal(pred_refit, pred_repeat)

    if fitted_model.seed is not None:
        assert same_after_refit and same_on_repeat
    else:
        # any difference across the two comparisons counts as diversity;
        # 4 users × 4 items makes an accidental full match unlikely but
        # possible, so allow either comparison to show it
        assert not (same_after_refit and same_on_repeat)


def test_invalid_distribution_raises():
    with pytest.raises(ValueError, match="distribution"):
        RandomRec(distribution="bogus")


def test_alpha_bound_raises():
    with pytest.raises(ValueError):
        RandomRec(distribution="popular_based", alpha=-1.5)
