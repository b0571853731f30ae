"""ALS / SLIM / Word2Vec tests on a block-structured log."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.models import ALSWrap, SLIM, Word2VecRec

N_GROUPS, GROUP_SIZE = 4, 25
N_ITEMS = N_GROUPS * GROUP_SIZE


@pytest.fixture(scope="module")
def block_dataset():
    """Users interact ~90% inside their item block — strong low-rank structure."""
    rng = np.random.default_rng(0)
    rows = []
    for u in range(120):
        group = u % N_GROUPS
        for t in range(30):
            if rng.random() < 0.9:
                item = int(group * GROUP_SIZE + rng.integers(0, GROUP_SIZE))
            else:
                item = int(rng.integers(0, N_ITEMS))
            rows.append((u, item, 1.0, t))
    df = pd.DataFrame(
        rows, columns=["user_id", "item_id", "rating", "timestamp"]
    ).drop_duplicates(["user_id", "item_id"])
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating",
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "timestamp",
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    return Dataset(schema, df)


def in_group_fraction(recs):
    hits = tot = 0
    for u, grp in recs.groupby("user_id"):
        g = u % N_GROUPS
        lo, hi = g * GROUP_SIZE, (g + 1) * GROUP_SIZE
        hits += ((grp["item_id"] >= lo) & (grp["item_id"] < hi)).sum()
        tot += len(grp)
    return hits / tot


@pytest.mark.parametrize(
    "model,threshold",
    [
        (ALSWrap(rank=16, seed=0, num_iterations=5), 0.8),
        (ALSWrap(rank=16, seed=0, num_iterations=5, implicit_prefs=False), 0.5),
        (SLIM(beta=0.01, lambda_=0.01), 0.9),
        (Word2VecRec(rank=16, window_size=3, max_iter=10, seed=0, batch_size=2048), 0.8),
    ],
    ids=["als-implicit", "als-explicit", "slim", "word2vec"],
)
def test_recovers_block_structure(block_dataset, model, threshold):
    model.fit(block_dataset)
    recs = model.predict(block_dataset, k=5)
    assert recs.groupby("user_id").size().max() <= 5
    frac = in_group_fraction(recs)
    assert frac > threshold, f"in-group fraction {frac}"
    # filter-seen honored
    seen = set(
        map(tuple, block_dataset.interactions[["user_id", "item_id"]].to_numpy())
    )
    rec_pairs = set(map(tuple, recs[["user_id", "item_id"]].to_numpy()))
    assert not (seen & rec_pairs)


def test_als_predict_pairs(block_dataset):
    model = ALSWrap(rank=8, seed=0, num_iterations=3)
    model.fit(block_dataset)
    pairs = pd.DataFrame({"user_id": [0, 0, 1], "item_id": [1, 50, 2]})
    scored = model.predict_pairs(pairs, block_dataset)
    assert len(scored) == 3
    assert scored["rating"].notna().all()


def test_als_nearest_items(block_dataset):
    model = ALSWrap(rank=16, seed=0, num_iterations=5)
    model.fit(block_dataset)
    nn = model.get_nearest_items([0], k=5)
    # items nearest to item 0 should come from its block
    assert (nn["neighbour_item_idx"] < GROUP_SIZE).mean() >= 0.8
    # self never returned
    assert (nn["neighbour_item_idx"] != 0).all()


def test_cg_matches_cholesky(block_dataset):
    """The CG solver (implicit-library approach, 3 steps, warm start) must
    land on the same solution as the exact batched Cholesky solve: same
    implicit-ALS objective to <1% and strongly overlapping top-k."""
    fitted = {}
    for solver in ("cg", "cholesky"):
        m = ALSWrap(rank=16, seed=0, num_iterations=8, solver=solver)
        m.fit(block_dataset)
        fitted[solver] = m

    inter = block_dataset.interactions
    n_q = len(fitted["cg"].fit_queries)
    n_i = len(fitted["cg"].fit_items)

    def objective(m):
        pref = np.zeros((n_q, n_i), dtype=np.float64)
        conf = np.ones((n_q, n_i), dtype=np.float64)
        qs = np.searchsorted(m.fit_queries, inter["user_id"].to_numpy())
        its = np.searchsorted(m.fit_items, inter["item_id"].to_numpy())
        pref[qs, its] = 1.0
        conf[qs, its] += m.alpha * inter["rating"].to_numpy()
        pred = m.query_factors @ m.item_factors.T
        reg = m.regularization * (
            (m.query_factors**2).sum() + (m.item_factors**2).sum()
        )
        return float((conf * (pref - pred) ** 2).sum() + reg)

    obj_cg, obj_chol = objective(fitted["cg"]), objective(fitted["cholesky"])
    assert abs(obj_cg - obj_chol) / obj_chol < 0.01, (obj_cg, obj_chol)

    recs_cg = fitted["cg"].predict(block_dataset, k=5)
    recs_chol = fitted["cholesky"].predict(block_dataset, k=5)
    a = recs_cg.groupby("user_id")["item_id"].apply(set)
    b = recs_chol.groupby("user_id")["item_id"].apply(set)
    overlap = np.mean([len(a[u] & b[u]) / 5 for u in a.index])
    assert overlap > 0.7, overlap


def test_word2vec_requires_dataset_at_predict(block_dataset):
    model = Word2VecRec(rank=8, max_iter=1, seed=0)
    model.fit(block_dataset)
    with pytest.raises(ValueError):
        model._score_block(np.array([0]), np.array([0]), dataset=None)


def test_slim_similarity_nonnegative_zero_diag(block_dataset):
    model = SLIM(beta=0.05, lambda_=0.05)
    model.fit(block_dataset)
    sim = np.asarray(model._sim_dense)
    assert sim.min() >= 0.0
    assert np.allclose(np.diag(sim), 0.0)


def _random_nonneg_dataset(n_users=60, n_items=25, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        items = rng.choice(n_items, size=rng.integers(3, 10), replace=False)
        for it in items:
            rows.append((u, int(it), float(rng.integers(1, 6)), 0))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating", FeatureType.NUMERICAL,
                feature_hint=FeatureHint.RATING, feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    return Dataset(schema, df)


def test_slim_matches_sklearn_elasticnet():
    """Differential test against the reference's exact inner solver: sklearn
    ElasticNet(positive=True, fit_intercept=False) per item column with the
    reference's parametrization (reference: replay/models/slim.py:93-124)."""
    from sklearn.linear_model import ElasticNet

    beta, lambda_ = 0.08, 0.03
    ds = _random_nonneg_dataset()
    model = SLIM(beta=beta, lambda_=lambda_, max_iter=3000, tol=1e-9)
    model.fit(ds)
    sim = np.asarray(model._sim_dense)

    inter = ds.interactions
    n_items = int(inter["item_id"].max()) + 1
    dense = np.zeros((int(inter["user_id"].max()) + 1, n_items), dtype=np.float64)
    dense[inter["user_id"], inter["item_id"]] = inter["rating"]
    alpha = beta + lambda_
    for j in range(n_items):
        x = dense.copy()
        y = dense[:, j].copy()
        x[:, j] = 0.0
        ref = ElasticNet(
            alpha=alpha, l1_ratio=lambda_ / alpha, fit_intercept=False,
            positive=True, max_iter=20000, tol=1e-10,
        ).fit(x, y)
        np.testing.assert_allclose(sim[:, j], ref.coef_, atol=2e-3)


def test_slim_active_set_matches_whole_gram():
    """The screened batched solver must reach the same fixed point as the
    whole-Gram FISTA (the round-1 path)."""
    from scipy.sparse import csr_matrix as _csr

    ds = _random_nonneg_dataset(seed=9)
    model = SLIM(beta=0.05, lambda_=0.02, max_iter=3000, tol=1e-9)
    model.fit(ds)  # active-set path
    sim_active = np.asarray(model._sim_dense).copy()

    inter = ds.interactions
    q = np.searchsorted(model.fit_queries, inter["user_id"].to_numpy())
    i = np.searchsorted(model.fit_items, inter["item_id"].to_numpy())
    mat = _csr(
        (inter["rating"].to_numpy(np.float32), (q, i)),
        shape=(len(model.fit_queries), len(model.fit_items)),
    )
    model._fit_whole_gram(mat)
    sim_whole = np.asarray(model._sim_dense)
    np.testing.assert_allclose(sim_active, sim_whole, atol=2e-3)


def test_slim_negative_ratings_fall_back(block_dataset):
    """Negative ratings invalidate the screen; the whole-Gram fallback must
    produce a usable model."""
    inter = block_dataset.interactions.copy()
    inter.loc[inter.index[:5], "rating"] = -1.0
    ds = Dataset(block_dataset.feature_schema, inter)
    model = SLIM(beta=0.05, lambda_=0.05)
    model.fit(ds)
    sim = np.asarray(model._sim_dense)
    assert np.allclose(np.diag(sim), 0.0)
    assert sim.max() > 0


def test_word2vec_degenerate_sequences_dont_crash():
    """All sequences shorter than the window: the reference's Spark
    Word2Vec still yields vectors; ours keeps the untrained init and warns
    instead of raising."""
    import warnings

    from replay_tpu.models import Word2VecRec

    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    ds = Dataset(
        schema,
        pd.DataFrame({"user_id": [0, 1], "item_id": [0, 0], "rating": [1.0, 1.0]}),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = Word2VecRec(rank=2, seed=1, min_count=0)
        model.fit(ds)
    recs = model.predict(ds, k=1, filter_seen_items=False)
    assert len(recs) == 2
    assert model.vectors.shape == (1, 2)


def test_als_get_features(block_dataset):
    """get_features returns latent factors keyed by id, drops unknown ids,
    reports the rank (reference: replay/models/als.py:148)."""
    model = ALSWrap(rank=8, seed=0, num_iterations=2)
    model.fit(block_dataset)

    ids = pd.DataFrame({"user_id": [0, 3, 999999]})  # last id never seen
    frame, rank = model.get_features(ids)
    assert rank == 8
    assert list(frame["user_id"]) == [0, 3]
    assert all(len(v) == 8 for v in frame["user_factors"])
    np.testing.assert_allclose(
        np.asarray(list(frame["user_factors"])[0]),
        model.query_factors[np.searchsorted(model.fit_queries, 0)],
    )

    items, irank = model.get_features(pd.DataFrame({"item_id": [5, 10]}))
    assert irank == 8 and list(items["item_id"]) == [5, 10]
    assert "item_factors" in items.columns

    with pytest.raises(ValueError):
        model.get_features(pd.DataFrame({"wrong": [1]}))


def test_get_features_none_for_factorless_models(block_dataset):
    from replay_tpu.models import PopRec

    model = PopRec()
    model.fit(block_dataset)
    assert model.get_features(pd.DataFrame({"item_id": [0]})) is None


@pytest.mark.mesh
@pytest.mark.parametrize("solver", ["cg", "cholesky"])
def test_mesh_sharded_fit_matches_single_device(block_dataset, solver):
    """mesh= shards every solve block's rows over the model axis (the
    ReplayALS blocked-distributed fit, reference: replay/models/als.py:76-82,
    ReplayALS.scala); factors must match the single-device fit."""
    from replay_tpu.parallel import make_mesh

    single = ALSWrap(rank=8, seed=7, num_iterations=3, solver=solver,
                     block_size=64)
    single.fit(block_dataset)
    sharded = ALSWrap(rank=8, seed=7, num_iterations=3, solver=solver,
                      block_size=64, mesh=make_mesh(data=1, model=8))
    sharded.fit(block_dataset)
    np.testing.assert_allclose(
        sharded.query_factors, single.query_factors, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        sharded.item_factors, single.item_factors, rtol=2e-4, atol=2e-5
    )
    r1 = single.predict(block_dataset, k=5)
    r2 = sharded.predict(block_dataset, k=5)
    pd.testing.assert_frame_equal(
        r1.sort_values(["user_id", "item_id"]).reset_index(drop=True)[["user_id", "item_id"]],
        r2.sort_values(["user_id", "item_id"]).reset_index(drop=True)[["user_id", "item_id"]],
    )


@pytest.mark.mesh
def test_mesh_sharded_explicit_fit_matches(block_dataset):
    from replay_tpu.parallel import make_mesh

    single = ALSWrap(rank=8, seed=7, num_iterations=2, implicit_prefs=False,
                     block_size=64)
    single.fit(block_dataset)
    sharded = ALSWrap(rank=8, seed=7, num_iterations=2, implicit_prefs=False,
                      block_size=64, mesh=make_mesh(data=1, model=8))
    sharded.fit(block_dataset)
    np.testing.assert_allclose(
        sharded.item_factors, single.item_factors, rtol=2e-4, atol=2e-5
    )
