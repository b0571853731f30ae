"""MetricsBuilder must agree with the offline dataframe metrics."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.metrics import MAP, MRR, NDCG, HitRate, Precision, Recall
from replay_tpu.metrics.builder import MetricsBuilder


@pytest.fixture()
def case():
    rng = np.random.default_rng(3)
    n_users, n_items, k = 12, 25, 5
    preds = np.stack([rng.permutation(n_items)[:k] for _ in range(n_users)])
    gt = np.full((n_users, 4), -1, dtype=np.int64)
    for u in range(n_users):
        n_gt = rng.integers(1, 5)
        gt[u, :n_gt] = rng.permutation(n_items)[:n_gt]
    return preds, gt


def to_frames(preds, gt):
    rec_rows, gt_rows = [], []
    for u in range(len(preds)):
        for rank, item in enumerate(preds[u]):
            rec_rows.append((u, int(item), float(len(preds[u]) - rank)))
        for item in gt[u]:
            if item >= 0:
                gt_rows.append((u, int(item)))
    recs = pd.DataFrame(rec_rows, columns=["query_id", "item_id", "rating"])
    truth = pd.DataFrame(gt_rows, columns=["query_id", "item_id"])
    return recs, truth


def test_builder_matches_offline_metrics(case):
    preds, gt = case
    recs, truth = to_frames(preds, gt)
    k = 5

    builder = MetricsBuilder(
        metrics=("map", "ndcg", "recall", "precision", "hitrate", "mrr"), ks=(k,)
    )
    builder.add_prediction(preds, gt)
    got = builder.get_metrics()

    for name, metric_cls in [
        ("precision", Precision),
        ("recall", Recall),
        ("map", MAP),
        ("mrr", MRR),
        ("ndcg", NDCG),
        ("hitrate", HitRate),
    ]:
        expected = list(metric_cls(k)(recs, truth).values())[0]
        np.testing.assert_allclose(
            got[f"{name}@{k}"], expected, rtol=1e-5, err_msg=name
        )


def test_builder_accumulates_over_batches(case):
    preds, gt = case
    one = MetricsBuilder(metrics=("ndcg",), ks=(5,))
    one.add_prediction(preds, gt)
    two = MetricsBuilder(metrics=("ndcg",), ks=(5,))
    two.add_prediction(preds[:6], gt[:6])
    two.add_prediction(preds[6:], gt[6:])
    np.testing.assert_allclose(
        one.get_metrics()["ndcg@5"], two.get_metrics()["ndcg@5"], rtol=1e-6
    )


def test_row_mask_excludes_padded_rows(case):
    preds, gt = case
    builder = MetricsBuilder(metrics=("recall",), ks=(5,))
    mask = np.ones(len(preds), dtype=np.int8)
    mask[-3:] = 0
    builder.add_prediction(preds, gt, row_mask=mask)
    ref = MetricsBuilder(metrics=("recall",), ks=(5,))
    ref.add_prediction(preds[:-3], gt[:-3])
    np.testing.assert_allclose(
        builder.get_metrics()["recall@5"], ref.get_metrics()["recall@5"], rtol=1e-6
    )


def test_novelty_and_coverage():
    preds = np.array([[0, 1, 2], [3, 4, 5]])
    train = np.array([[0, -1], [9, -1]])
    builder = MetricsBuilder(metrics=("novelty", "coverage"), ks=(3,), item_count=10)
    builder.add_prediction(preds, np.array([[1, -1], [4, -1]]), train=train)
    got = builder.get_metrics()
    np.testing.assert_allclose(got["novelty@3"], (2 / 3 + 1.0) / 2)
    # reference coverage: |recs ∩ train items| / |train items| — recs cover
    # {0..5}, train items are {0, 9} → 1/2 (torch_metrics_builder.py:147)
    np.testing.assert_allclose(got["coverage@3"], 1 / 2)

    # without train batches, falls back to catalog share: 6 unique / 10
    builder = MetricsBuilder(metrics=("coverage",), ks=(3,), item_count=10)
    builder.add_prediction(preds, np.array([[1, -1], [4, -1]]))
    np.testing.assert_allclose(builder.get_metrics()["coverage@3"], 6 / 10)


def test_metrics_to_df():
    from replay_tpu.metrics import metrics_to_df

    frame = metrics_to_df({"ndcg@5": 0.1, "ndcg@10": 0.2, "recall@5": 0.3})
    assert frame.loc["ndcg", "@10"] == 0.2
    assert frame.loc["recall", "@5"] == 0.3
