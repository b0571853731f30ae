"""Experimental-zoo save→load→predict-equality roundtrips (round 5 —
companion to tests/utils/test_model_roundtrip_zoo.py)."""

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.utils import load, save


@pytest.fixture(scope="module")
def exp_data():
    rng = np.random.default_rng(5)
    n = 900
    log = pd.DataFrame(
        {
            "query_id": rng.integers(0, 30, n),
            "item_id": rng.integers(0, 40, n),
            "rating": rng.integers(0, 2, n).astype(float) + 0.5,
            "timestamp": np.arange(n),
        }
    ).drop_duplicates(["query_id", "item_id"])
    base = [
        FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
        FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                    feature_source=FeatureSource.INTERACTIONS),
        FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                    feature_source=FeatureSource.INTERACTIONS),
    ]
    plain = Dataset(FeatureSchema(base), log, check_consistency=False)
    q_feats = pd.DataFrame({"query_id": np.arange(30), "age": rng.random(30)})
    i_feats = pd.DataFrame({"item_id": np.arange(40), "price": rng.random(40)})
    featured = Dataset(
        FeatureSchema(base + [
            FeatureInfo("age", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
            FeatureInfo("price", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES),
        ]),
        log, query_features=q_feats, item_features=i_feats, check_consistency=False,
    )
    return plain, featured


def _zoo():
    import replay_tpu.experimental.models as E

    plain = [
        E.ADMMSLIM(seed=3),
        E.NeuroMF(embedding_gmf_dim=4, embedding_mlp_dim=4, epochs=1, seed=3),
        E.MultVAE(epochs=1, latent_dim=8, hidden_dim=16, seed=3),
        E.DDPG(embedding_dim=8, epochs=1, batch_size=64, seed=3),
    ]
    featured = [E.ULinUCB()]
    return [(m, False) for m in plain] + [(m, True) for m in featured]


@pytest.mark.parametrize(
    "model,needs_features", _zoo(),
    ids=lambda p: type(p).__name__ if not isinstance(p, bool) else ("feat" if p else "plain"),
)
def test_save_load_predict_equality(tmp_path, exp_data, model, needs_features):
    plain, featured = exp_data
    ds = featured if needs_features else plain
    model.fit(ds)
    before = model.predict(ds, k=5)
    save(model, str(tmp_path / "m"))
    loaded = load(str(tmp_path / "m"))
    after = loaded.predict(ds, k=5)
    key = sorted(before.columns)
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True)[key],
        after.sort_values(key).reset_index(drop=True)[key],
        check_dtype=False,
        obj=type(model).__name__,
    )
