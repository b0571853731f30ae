"""Uniform behavioral contract across the whole classical model zoo.

Mirrors the reference's cross-model sweep (reference:
tests/models/test_all_models.py — predict_pairs consistency :55, pairs k
truncation :115, empty-history predict :168, filter_seen :352, cold/new
queries :399) on the single pandas/jax data plane.  Every exported model
must honor the same fit/predict/predict_pairs/save-load semantics.
"""

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import (
    KLUCB,
    SLIM,
    UCB,
    ALSWrap,
    AssociationRulesItemRec,
    ItemKNN,
    PopRec,
    QueryPopRec,
    RandomRec,
    ThompsonSampling,
    Wilson,
    Word2VecRec,
)
from replay_tpu.utils.model_handler import load, save

SEED = 123


def make_dataset(df):
    cols = [
        FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
        FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
    ]
    if "timestamp" in df.columns:
        cols.append(FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP))
    return Dataset(FeatureSchema(cols), df)


@pytest.fixture(scope="module")
def log():
    """~35 users × 20 items, every item seen by several users."""
    rng = np.random.default_rng(SEED)
    rows = []
    for u in range(35):
        items = rng.choice(20, size=rng.integers(4, 9), replace=False)
        for t, i in enumerate(items):
            rows.append((u, int(i), float(rng.integers(1, 6)), t))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])


@pytest.fixture(scope="module")
def binary_log(log):
    out = log.copy()
    out["rating"] = (out["rating"] > 3).astype(float)
    return out


def zoo(binary: bool = False):
    """Fresh model instances; bandits need binary ratings."""
    if binary:
        return [
            UCB(),
            KLUCB(),
            ThompsonSampling(seed=SEED),
            Wilson(),
        ]
    return [
        PopRec(),
        QueryPopRec(),
        RandomRec(seed=SEED),
        ItemKNN(num_neighbours=10),
        ALSWrap(rank=8, seed=SEED, num_iterations=3),
        SLIM(seed=SEED),
        Word2VecRec(rank=8, seed=SEED, min_count=0),
        AssociationRulesItemRec(min_item_count=1, min_pair_count=0),
    ]


def _ids(models):
    return [type(m).__name__ for m in models]


ALL = zoo() + zoo(binary=True)
ALL_IDS = _ids(ALL)
_IS_BINARY = [False] * len(zoo()) + [True] * len(zoo(binary=True))


@pytest.fixture(scope="module")
def fitted(log, binary_log):
    """Fit every model once for the read-only contract checks."""
    out = {}
    for model, is_bin in zip(ALL, _IS_BINARY):
        ds = make_dataset(binary_log if is_bin else log)
        model.fit(ds)
        out[type(model).__name__] = (model, ds)
    return out


@pytest.mark.parametrize("name", ALL_IDS)
def test_predict_shape_and_sorting(fitted, name):
    model, ds = fitted[name]
    recs = model.predict(ds, k=5, filter_seen_items=False)
    per_user = recs.groupby("user_id").size()
    if name == "QueryPopRec":
        # can only re-recommend a query's own history, which may be < k
        assert (per_user <= 5).all() and (per_user > 0).all()
    else:
        assert (per_user == 5).all(), f"{name}: expected 5 recs per query"
    # ratings sorted descending within each user
    for _, grp in recs.groupby("user_id"):
        r = grp["rating"].to_numpy()
        assert (np.diff(r) <= 1e-9).all(), f"{name}: recs not sorted"


@pytest.mark.parametrize("name", ALL_IDS)
def test_filter_seen(fitted, name):
    if name == "QueryPopRec":
        pytest.skip("recommends only seen items by definition; warns instead")
    model, ds = fitted[name]
    recs = model.predict(ds, k=5, filter_seen_items=True)
    inter = ds.interactions
    seen = set(map(tuple, inter[["user_id", "item_id"]].to_numpy()))
    got = set(map(tuple, recs[["user_id", "item_id"]].to_numpy()))
    assert not (seen & got), f"{name}: recommended already-seen items"


@pytest.mark.parametrize("name", ALL_IDS)
def test_predict_queries_items_subset(fitted, name):
    model, ds = fitted[name]
    queries = [0, 1, 2]
    items = [3, 4, 5, 6, 7]
    recs = model.predict(
        ds, k=3, queries=queries, items=items, filter_seen_items=False
    )
    assert set(recs["user_id"]) <= set(queries), name
    assert set(recs["item_id"]) <= set(items), name


@pytest.mark.parametrize("name", ALL_IDS)
def test_predict_pairs_matches_predict(fitted, name):
    """predict_pairs must agree with predict scores on the same (q, i)
    cells (reference: test_all_models.py:55 consistency contract)."""
    model, ds = fitted[name]
    if name == "RandomRec":
        pytest.skip("scores are sampled noise; equality is not defined")
    recs = model.predict(ds, k=20, filter_seen_items=False)
    pairs = recs[["user_id", "item_id"]].head(40)
    pair_scores = model.predict_pairs(pairs, ds)
    merged = pair_scores.merge(
        recs, on=["user_id", "item_id"], suffixes=("_pairs", "_recs")
    )
    assert len(merged) == len(pair_scores)
    np.testing.assert_allclose(
        merged["rating_pairs"].to_numpy(),
        merged["rating_recs"].to_numpy(),
        rtol=1e-5,
        atol=1e-6,
        err_msg=name,
    )


@pytest.mark.parametrize("name", ALL_IDS)
def test_predict_pairs_k_truncation(fitted, name):
    """k=1 keeps each query's single best-scored pair
    (reference: test_all_models.py:115)."""
    model, ds = fitted[name]
    inter = ds.interactions
    pairs = inter[["user_id", "item_id"]].drop_duplicates()
    topk = model.predict_pairs(pairs, ds, k=1)
    assert (topk.groupby("user_id").size() <= 1).all(), name
    full = model.predict_pairs(pairs, ds)
    if name != "RandomRec":
        best = full.loc[full.groupby("user_id")["rating"].idxmax()]
        merged = topk.merge(best, on="user_id", suffixes=("_k", "_best"))
        np.testing.assert_allclose(
            merged["rating_k"].to_numpy(),
            merged["rating_best"].to_numpy(),
            rtol=1e-5,
            err_msg=name,
        )


@pytest.mark.parametrize("name", ALL_IDS)
def test_save_load_predict_equal(fitted, name, tmp_path):
    model, ds = fitted[name]
    before = model.predict(ds, k=5, filter_seen_items=False)
    save(model, tmp_path / name, overwrite=True)
    restored = load(tmp_path / name)
    after = restored.predict(ds, k=5, filter_seen_items=False)
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True),
        after.reset_index(drop=True),
        check_exact=False,
        rtol=1e-5,
        atol=1e-8,
    )


@pytest.mark.parametrize("name", ALL_IDS)
def test_unfitted_predict_raises(name):
    model = dict(zip(ALL_IDS, ALL))[name]
    fresh = type(model)() if name != "RandomRec" else RandomRec(seed=SEED)
    ds = make_dataset(
        pd.DataFrame({"user_id": [0], "item_id": [0], "rating": [1.0]})
    )
    with pytest.raises(ValueError, match="not fitted"):
        fresh.predict(ds, k=1)
    with pytest.raises(ValueError, match="not fitted"):
        fresh.predict_pairs(ds.interactions[["user_id", "item_id"]], ds)


@pytest.mark.parametrize("name", ALL_IDS)
def test_new_query_behavior(fitted, name, log, binary_log):
    """Queries absent from training either get cold fallback recs (models
    with can_predict_cold_queries) or are silently dropped (reference:
    test_all_models.py:399-455)."""
    model, ds = fitted[name]
    base = binary_log if name in ("UCB", "KLUCB", "ThompsonSampling", "Wilson") else log
    new_q = base.copy()
    extra = base.head(3).copy()
    extra["user_id"] = 999
    pred_ds = make_dataset(pd.concat([new_q, extra], ignore_index=True))
    recs = model.predict(pred_ds, k=2, queries=[0, 999], filter_seen_items=False)
    if model.can_predict_cold_queries:
        assert set(recs["user_id"]) == {0, 999}, name
    else:
        assert 999 not in set(recs["user_id"]) or model.can_predict_cold_queries, name
    assert 0 in set(recs["user_id"]), name


# ----------------------------------------------------- empty/None dataset

HISTORY_FREE = ["PopRec", "RandomRec", "ALSWrap", "QueryPopRec", "UCB", "KLUCB",
                "ThompsonSampling", "Wilson"]
HISTORY_BOUND = ["ItemKNN", "SLIM", "Word2VecRec", "AssociationRulesItemRec"]


@pytest.mark.parametrize("name", HISTORY_FREE)
def test_predict_without_dataset(fitted, name):
    """Models whose scores need no interaction history serve with
    dataset=None (reference: test_all_models.py:206)."""
    model, _ = fitted[name]
    recs = model.predict(None, k=1)
    assert len(recs) > 0


@pytest.mark.parametrize("name", HISTORY_BOUND)
def test_predict_without_dataset_raises(fitted, name):
    """History-bound models must raise the reference's error text
    (reference: test_all_models.py:233)."""
    model, _ = fitted[name]
    with pytest.raises(ValueError, match="interactions are not provided"):
        model.predict(None, k=1)


@pytest.mark.parametrize("name", ALL_IDS)
def test_predict_with_empty_history(fitted, name, log, binary_log):
    """Prediction over a dataset with an empty interaction frame still
    succeeds (reference: test_all_models.py:168 cold-serving contract)."""
    model, ds = fitted[name]
    base = ds.interactions
    empty = make_dataset(base.head(0))
    recs = model.predict(empty, k=1, queries=[0], filter_seen_items=False)
    assert recs is not None


# ----------------------------------------------------------- nearest items


@pytest.mark.parametrize(
    ("name", "metric"),
    [
        ("ALSWrap", "cosine_similarity"),
        ("ALSWrap", "dot_product"),
        ("ALSWrap", "euclidean_distance_sim"),
        ("Word2VecRec", "cosine_similarity"),
        ("ItemKNN", None),
        ("SLIM", None),
        ("AssociationRulesItemRec", "lift"),
        ("AssociationRulesItemRec", "confidence"),
    ],
)
def test_get_nearest_items(fitted, name, metric):
    """k neighbours per item, self excluded for vector models, candidates
    filter respected (reference: test_all_models.py:296)."""
    model, _ = fitted[name]
    kwargs = {} if metric is None else {"metric": metric}
    res = model.get_nearest_items(items=[0, 1], k=2, **kwargs)
    assert set(res["item_id"]) <= {0, 1}
    assert (res.groupby("item_id").size() <= 2).all()
    res1 = model.get_nearest_items(items=[0, 1], k=1, **kwargs)
    assert (res1.groupby("item_id").size() <= 1).all()


@pytest.mark.parametrize("name", ["ALSWrap", "Word2VecRec"])
def test_get_nearest_items_candidates(fitted, name):
    model, _ = fitted[name]
    res = model.get_nearest_items(items=[0, 1], k=4, candidates=[0, 3])
    # self-similarity excluded: item 0 can only match 3; item 1 matches 0, 3
    assert set(res["neighbour_item_idx"]) <= {0, 3}
    got_0 = res[res["item_id"] == 0]["neighbour_item_idx"]
    assert 0 not in set(got_0)


@pytest.mark.parametrize(
    ("name", "metric"),
    [("ItemKNN", "cosine_similarity"), ("SLIM", "dot_product"),
     ("ItemKNN", "lift"), ("SLIM", "confidence_gain")],
)
def test_get_nearest_items_metric_error(fitted, name, metric):
    """Similarity-matrix models reject vector-space metric names
    (reference: test_all_models.py:344)."""
    model, _ = fitted[name]
    with pytest.raises(ValueError):
        model.get_nearest_items(items=[0, 1], k=2, metric=metric)


# ------------------------------------------------------------ to-file


@pytest.mark.parametrize("name", ["PopRec", "ItemKNN", "ALSWrap"])
def test_predict_to_file_roundtrip(fitted, name, tmp_path):
    """recs_file_path writes parquet and returns None
    (reference: test_all_models.py:484-545)."""
    model, ds = fitted[name]
    direct = model.predict(ds, k=3, filter_seen_items=False)
    out = model.predict(
        ds, k=3, filter_seen_items=False, recs_file_path=str(tmp_path / "recs.parquet")
    )
    assert out is None
    from_file = pd.read_parquet(tmp_path / "recs.parquet")
    pd.testing.assert_frame_equal(
        direct.reset_index(drop=True), from_file.reset_index(drop=True)
    )
    pairs = direct[["user_id", "item_id"]].head(10)
    direct_pairs = model.predict_pairs(pairs, ds)
    out = model.predict_pairs(
        pairs, ds, recs_file_path=str(tmp_path / "pairs.parquet")
    )
    assert out is None
    pd.testing.assert_frame_equal(
        direct_pairs.reset_index(drop=True),
        pd.read_parquet(tmp_path / "pairs.parquet").reset_index(drop=True),
    )


# ------------------------------------------------- cold items (nonpers)


@pytest.mark.parametrize("add_cold_items", [True, False])
@pytest.mark.parametrize("predict_cold_only", [True, False])
def test_add_cold_items_for_nonpersonalized(log, add_cold_items, predict_cold_only):
    """PopRec cold-item handling: add_cold_items=True ranks unseen items
    with the uniform cold weight; False drops them
    (reference: test_all_models.py:547)."""
    num_warm, k = 5, 6
    train = log[log["item_id"] < num_warm]
    model = PopRec()
    model.fit(make_dataset(train))
    model.add_cold_items = add_cold_items
    items = np.unique(log["item_id"])
    if predict_cold_only:
        items = items[items >= num_warm]
    pred = model.predict(
        make_dataset(train), k=k, queries=[1], items=items, filter_seen_items=False
    )
    if add_cold_items:
        assert len(pred) == min(k, len(items))
        if predict_cold_only:
            assert pred["item_id"].min() >= num_warm
            assert pred["rating"].nunique() == 1  # uniform cold score
    else:
        if predict_cold_only:
            assert len(pred) == 0
        else:
            assert pred["item_id"].max() < num_warm
