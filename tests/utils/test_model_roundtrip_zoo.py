"""Whole-zoo save→load→predict-equality roundtrips (round 5: the targeted
drive found TWO real bugs — ClusterRec lost ``_feature_columns`` and LinUCB
lost ``_feature_cols``/``_item_features``/``beta_shared`` through
save/load, crashing predict on the loaded model).

reference contract: replay/utils/model_handler.py save/load reflection.
"""

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
def zoo_data():
    rng = np.random.default_rng(5)
    n = 1200
    log = pd.DataFrame(
        {
            "query_id": rng.integers(0, 40, n),
            "item_id": rng.integers(0, 60, n),
            "rating": rng.integers(0, 2, n).astype(float),
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
    q_feats = pd.DataFrame({"query_id": np.arange(40),
                            "age": rng.random(40), "income": rng.random(40)})
    i_feats = pd.DataFrame({"item_id": np.arange(60), "price": rng.random(60)})
    featured = Dataset(
        FeatureSchema(base + [
            FeatureInfo("age", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
            FeatureInfo("income", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
            FeatureInfo("price", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES),
        ]),
        log, query_features=q_feats, item_features=i_feats, check_consistency=False,
    )
    return plain, featured


def _zoo():
    from replay_tpu.models import (
        ALSWrap,
        AssociationRulesItemRec,
        ClusterRec,
        ItemKNN,
        KLUCB,
        LinUCB,
        PopRec,
        QueryPopRec,
        RandomRec,
        SLIM,
        ThompsonSampling,
        UCB,
        Wilson,
        Word2VecRec,
    )

    plain = [
        PopRec(), QueryPopRec(), Wilson(), UCB(), KLUCB(),
        ThompsonSampling(seed=3), RandomRec(seed=3), ItemKNN(num_neighbours=8),
        ALSWrap(rank=6, num_iterations=2, seed=3), SLIM(seed=3),
        Word2VecRec(rank=12, seed=3, max_iter=1, min_count=1),
        AssociationRulesItemRec(min_item_count=1, min_pair_count=1),
    ]
    featured = [LinUCB(eps=-10.0, alpha=1.0), ClusterRec(num_clusters=4)]
    return [(m, False) for m in plain] + [(m, True) for m in featured]


@pytest.mark.parametrize(
    "model,needs_features", _zoo(),
    ids=lambda p: type(p).__name__ if not isinstance(p, bool) else ("feat" if p else "plain"),
)
def test_save_load_predict_equality(tmp_path, zoo_data, model, needs_features):
    plain, featured = zoo_data
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


def test_ann_index_survives_save_load(tmp_path, zoo_data):
    """ANN params persist and the index rebuilds on load (round 5 — before
    this a loaded ANN model silently degraded to exact scoring)."""
    from replay_tpu.ann.mixin import HnswParam, SparseSimParam
    from replay_tpu.models import ALSWrap, ItemKNN

    plain, _ = zoo_data
    als = ALSWrap(rank=6, num_iterations=2, seed=3, index_builder=HnswParam(ef_search=200))
    als.fit(plain)
    r1 = als.predict(plain, k=5)
    save(als, str(tmp_path / "als"))
    loaded = load(str(tmp_path / "als"))
    assert loaded.ann_enabled and loaded._ann_index is not None
    r2 = loaded.predict(plain, k=5)
    key = sorted(r1.columns)
    pd.testing.assert_frame_equal(
        r1.sort_values(key).reset_index(drop=True)[key],
        r2.sort_values(key).reset_index(drop=True)[key], check_dtype=False)

    knn = ItemKNN(num_neighbours=8, index_builder=SparseSimParam())
    knn.fit(plain)
    k1 = knn.predict(plain, k=5)
    save(knn, str(tmp_path / "knn"))
    loaded_knn = load(str(tmp_path / "knn"))
    assert loaded_knn.index_builder is not None
    k2 = loaded_knn.predict(plain, k=5)
    pd.testing.assert_frame_equal(
        k1.sort_values(key).reset_index(drop=True)[key],
        k2.sort_values(key).reset_index(drop=True)[key], check_dtype=False)
