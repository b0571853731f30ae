"""Batch (vectorized pandas) vs per-user (dict) path equivalence, and speed
sanity at ML-20M-ish scale (VERDICT round-1 item 6)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.metrics import MAP, MRR, NDCG, HitRate, Precision, Recall, RocAuc
from replay_tpu.metrics.descriptors import ConfidenceInterval, Median, PerUser
from replay_tpu.metrics.offline_metrics import OfflineMetrics

METRICS = [Precision, Recall, MAP, MRR, NDCG, HitRate, RocAuc]


def _random_frames(seed=0, n_users=200, n_items=500, k=12):
    rng = np.random.default_rng(seed)
    recs_rows, gt_rows = [], []
    for u in range(n_users):
        n_rec = int(rng.integers(1, k + 4))
        items = rng.choice(n_items, size=n_rec, replace=False)
        scores = rng.normal(size=n_rec)
        recs_rows += [(u, int(it), float(s)) for it, s in zip(items, scores)]
        n_gt = int(rng.integers(1, 8))
        gt_rows += [(u, int(it)) for it in rng.choice(n_items, size=n_gt, replace=False)]
    recs = pd.DataFrame(recs_rows, columns=["query_id", "item_id", "rating"])
    gt = pd.DataFrame(gt_rows, columns=["query_id", "item_id"])
    return recs, gt


def _to_dicts(recs, gt):
    rd = {
        u: list(zip(grp["item_id"], grp["rating"]))
        for u, grp in recs.groupby("query_id")
    }
    gd = {u: list(grp["item_id"]) for u, grp in gt.groupby("query_id")}
    return rd, gd


@pytest.mark.parametrize("metric_cls", METRICS, ids=lambda c: c.__name__)
def test_batch_path_equals_per_user_path(metric_cls):
    recs, gt = _random_frames()
    rd, gd = _to_dicts(recs, gt)
    m = metric_cls([1, 3, 10])
    got = m(recs, gt)          # pandas → batch kernels
    expected = m(rd, gd)       # dict → per-user python kernels
    assert got.keys() == expected.keys()
    for name in got:
        np.testing.assert_allclose(got[name], expected[name], rtol=1e-12, err_msg=name)


@pytest.mark.parametrize("mode", [PerUser(), Median(), ConfidenceInterval(0.95)])
def test_batch_path_descriptors(mode):
    recs, gt = _random_frames(seed=5)
    rd, gd = _to_dicts(recs, gt)
    m = NDCG([5, 10], mode=mode)
    got, expected = m(recs, gt), m(rd, gd)
    for name in got:
        if isinstance(got[name], dict):
            assert got[name].keys() == expected[name].keys()
            for u in got[name]:
                np.testing.assert_allclose(got[name][u], expected[name][u])
        else:
            np.testing.assert_allclose(got[name], expected[name])


def test_batch_path_with_duplicates_and_missing_users():
    """Duplicate (user, item) pairs warn; users missing from recs score 0;
    recs-only users are ignored (reference iterates ground-truth users)."""
    recs = pd.DataFrame(
        {"query_id": [0, 0, 0, 2], "item_id": [1, 1, 3, 4], "rating": [3.0, 2.0, 1.0, 1.0]}
    )
    gt = pd.DataFrame({"query_id": [0, 1], "item_id": [1, 9]})
    m = HitRate([2])
    with pytest.warns(Warning):
        got = m(recs, gt)
    rd = {0: [(1, 3.0), (1, 2.0), (3, 1.0)], 2: [(4, 1.0)]}
    gd = {0: [1], 1: [9]}
    with pytest.warns(Warning):
        expected = m(rd, gd)
    assert got == expected


def test_offline_metrics_shares_prep_and_matches():
    recs, gt = _random_frames(seed=7)
    rd, gd = _to_dicts(recs, gt)
    metrics = [Precision([5, 10]), Recall([10]), MAP([10]), MRR([10]), NDCG([10]),
               HitRate([10]), RocAuc([10])]
    got = OfflineMetrics(metrics)(recs, gt)
    expected = {}
    for m in metrics:
        expected.update(m(rd, gd))
    assert got.keys() == expected.keys()
    for name in got:
        np.testing.assert_allclose(got[name], expected[name], rtol=1e-12, err_msg=name)


def test_batch_scale_speed():
    """138k users × k=10 evaluates in seconds, not minutes."""
    import time

    rng = np.random.default_rng(0)
    n_users, k, n_items = 138_000, 10, 20_000
    users = np.repeat(np.arange(n_users), k)
    recs = pd.DataFrame(
        {
            "query_id": users,
            "item_id": rng.integers(0, n_items, size=n_users * k),
            "rating": rng.normal(size=n_users * k),
        }
    )
    gt = pd.DataFrame(
        {
            "query_id": np.repeat(np.arange(n_users), 5),
            "item_id": rng.integers(0, n_items, size=n_users * 5),
        }
    )
    t0 = time.time()
    out = OfflineMetrics([NDCG([10]), MAP([10]), Recall([10]), MRR([10])])(recs, gt)
    took = time.time() - t0
    assert set(out) == {"NDCG@10", "MAP@10", "Recall@10", "MRR@10"}
    # generous bound: catches a regression to the round-1 per-user python
    # loops (10+ minutes at this scale) without flaking when the 4-core CI
    # box is contended (measured 2.1s idle, up to ~2min under full load)
    assert took < 180, f"batch metrics too slow: {took:.1f}s"
