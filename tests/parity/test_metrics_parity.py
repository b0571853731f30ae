"""Ranking/beyond-accuracy metrics vs the reference implementation."""

import numpy as np
import pandas as pd
import pytest

import replay_tpu.metrics as ours

KS = [1, 3, 5, 10]


@pytest.mark.parametrize(
    "name", ["NDCG", "MAP", "MRR", "Precision", "Recall", "HitRate", "RocAuc"]
)
def test_ranking_metric_matches_reference(reference, random_recs_gt, name):
    import replay.metrics as theirs

    recs, gt = random_recs_gt
    mine = getattr(ours, name)(KS)(recs, gt)
    ref = getattr(theirs, name)(KS)(recs, gt)
    assert set(mine) == set(ref)
    for key in ref:
        np.testing.assert_allclose(mine[key], ref[key], rtol=1e-9, err_msg=key)


@pytest.mark.parametrize("name", ["Coverage", "Novelty", "Surprisal"])
def test_train_based_metric_matches_reference(reference, random_recs_gt, random_log, name):
    import replay.metrics as theirs

    recs, _ = random_recs_gt
    train = random_log
    mine = getattr(ours, name)(KS)(recs, train)
    ref = getattr(theirs, name)(KS)(recs, train)
    assert set(mine) == set(ref)
    for key in ref:
        np.testing.assert_allclose(mine[key], ref[key], rtol=1e-9, err_msg=key)


def test_offline_metrics_match_reference(reference, random_recs_gt, random_log):
    from replay.metrics import (
        MAP as RefMAP,
        MRR as RefMRR,
        NDCG as RefNDCG,
        Coverage as RefCoverage,
        HitRate as RefHitRate,
        Novelty as RefNovelty,
        OfflineMetrics as RefOffline,
        Precision as RefPrecision,
        Recall as RefRecall,
    )

    recs, gt = random_recs_gt
    train = random_log
    mine = ours.OfflineMetrics(
        [ours.NDCG(KS), ours.MAP(KS), ours.MRR(KS), ours.Precision(KS),
         ours.Recall(KS), ours.HitRate(KS), ours.Coverage(KS), ours.Novelty(KS)]
    )(recs, gt, train)
    ref = RefOffline(
        [RefNDCG(KS), RefMAP(KS), RefMRR(KS), RefPrecision(KS),
         RefRecall(KS), RefHitRate(KS), RefCoverage(KS), RefNovelty(KS)]
    )(recs, gt, train)
    assert set(mine) == set(ref)
    for key in ref:
        np.testing.assert_allclose(mine[key], ref[key], rtol=1e-9, err_msg=key)


def test_unexpectedness_matches_reference(reference, random_recs_gt):
    import replay.metrics as theirs

    recs, gt = random_recs_gt
    base = recs.copy()
    base["rating"] = -base["rating"]  # a different base ranking
    mine = ours.Unexpectedness(KS)(recs, base)
    ref = theirs.Unexpectedness(KS)(recs, base)
    for key in ref:
        np.testing.assert_allclose(mine[key], ref[key], rtol=1e-9, err_msg=key)


@pytest.mark.parametrize("descriptor_name", ["Median", "ConfidenceInterval", "PerUser"])
def test_descriptor_modes_match_reference(reference, random_recs_gt, descriptor_name):
    """Aggregation descriptors beyond Mean (reference:
    replay/metrics/descriptors.py:35-121) produce identical values."""
    from replay.metrics import NDCG as RefNDCG
    from replay.metrics import ConfidenceInterval as RefCI
    from replay.metrics import Median as RefMedian
    from replay.metrics import PerUser as RefPerUser

    from replay_tpu.metrics import NDCG, ConfidenceInterval, Median, PerUser

    recs, gt = random_recs_gt
    ours_mode = {
        "Median": Median(),
        "ConfidenceInterval": ConfidenceInterval(0.9),
        "PerUser": PerUser(),
    }[descriptor_name]
    ref_mode = {
        "Median": RefMedian(),
        "ConfidenceInterval": RefCI(0.9),
        "PerUser": RefPerUser(),
    }[descriptor_name]
    ours = NDCG(5, mode=ours_mode, query_column="query_id", item_column="item_id",
                rating_column="rating")(recs, gt)
    theirs = RefNDCG(5, mode=ref_mode, query_column="query_id", item_column="item_id",
                     rating_column="rating")(recs, gt)
    o_val = list(ours.values())[0]
    t_val = list(theirs.values())[0]
    if descriptor_name == "PerUser":
        assert set(o_val) == set(t_val)
        for q in o_val:
            assert o_val[q] == pytest.approx(t_val[q], abs=1e-9)
    else:
        assert o_val == pytest.approx(t_val, abs=1e-9)


def test_categorical_diversity_matches_reference(reference):
    from replay.metrics import CategoricalDiversity as RefCD

    from replay_tpu.metrics import CategoricalDiversity

    rng = np.random.default_rng(4)
    n = 400
    recs = (
        pd.DataFrame(
            {
                "query_id": rng.integers(0, 25, n),
                "category_id": rng.integers(0, 8, n),
                "rating": rng.uniform(size=n),
            }
        )
        .drop_duplicates(["query_id", "category_id"])
        .reset_index(drop=True)
    )
    mine = CategoricalDiversity([3, 5], query_column="query_id",
                                category_column="category_id",
                                rating_column="rating")(recs)
    ref = RefCD([3, 5], query_column="query_id", category_column="category_id",
                rating_column="rating")(recs)
    assert set(mine) == set(ref)
    for key in ref:
        np.testing.assert_allclose(mine[key], ref[key], rtol=1e-9, err_msg=key)
