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
