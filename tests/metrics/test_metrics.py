import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.metrics import (
    MAP,
    MRR,
    NDCG,
    CategoricalDiversity,
    ConfidenceInterval,
    Coverage,
    Experiment,
    HitRate,
    Median,
    MetricDuplicatesWarning,
    Novelty,
    OfflineMetrics,
    PerUser,
    Precision,
    Recall,
    RocAuc,
    Surprisal,
    Unexpectedness,
)


@pytest.fixture()
def recommendations():
    return pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3],
            "item_id": [3, 7, 10, 11, 2, 5, 8, 11, 1, 3, 4, 9, 2],
            "rating": [0.6, 0.5, 0.4, 0.3, 0.2, 0.6, 0.5, 0.4, 0.3, 0.2, 1.0, 0.5, 0.1],
        }
    )


@pytest.fixture()
def groundtruth():
    return pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3],
            "item_id": [5, 6, 7, 8, 9, 10, 6, 7, 4, 10, 11, 1, 2, 3, 4, 5],
        }
    )


@pytest.fixture()
def train():
    return pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3],
            "item_id": [5, 6, 8, 9, 2, 5, 8, 11, 1, 3, 4, 9, 2],
        }
    )


@pytest.fixture()
def base_rec():
    return pd.DataFrame(
        {
            "query_id": [1, 1, 1, 2, 2, 2, 3, 3],
            "item_id": [3, 7, 2, 5, 8, 3, 4, 9],
            "rating": [0.5, 0.5, 0.7, 0.6, 0.6, 0.3, 1.0, 0.5],
        }
    )


class TestRankingMetricsReferenceParity:
    """Values cross-checked against the reference Experiment doctest
    (reference: replay/metrics/experiment.py:75-93)."""

    def test_ndcg_reference_values(self, recommendations, groundtruth):
        result = NDCG([2, 3])(recommendations, groundtruth)
        assert result["NDCG@2"] == pytest.approx(0.333333, abs=1e-5)
        assert result["NDCG@3"] == pytest.approx(0.48976, abs=1e-4)

    def test_surprisal_reference_value(self, recommendations, groundtruth, train):
        result = Surprisal(3)(recommendations, train)
        assert result["Surprisal@3"] == pytest.approx(0.719587, abs=1e-5)

    def test_experiment_reference_table(self, recommendations, groundtruth, train, base_rec):
        ex = Experiment([NDCG([2, 3]), Surprisal(3)], groundtruth, train)
        ex.add_result("baseline", base_rec)
        ex.add_result("model", recommendations)
        assert ex.results.loc["baseline", "NDCG@2"] == pytest.approx(0.333333, abs=1e-5)
        assert ex.results.loc["baseline", "NDCG@3"] == pytest.approx(0.25512, abs=1e-4)
        assert ex.results.loc["baseline", "Surprisal@3"] == pytest.approx(0.608476, abs=1e-5)
        assert ex.results.loc["model", "Surprisal@3"] == pytest.approx(0.719587, abs=1e-5)
        cmp = ex.compare("baseline")
        assert cmp.loc["model", "NDCG@3"] == "91.97%"
        assert cmp.loc["baseline", "NDCG@2"] == "–"

    def test_experiment_median_ci(self, recommendations, groundtruth, base_rec):
        ex = Experiment(
            [Precision(3, mode=Median()), Precision(3, mode=ConfidenceInterval(0.95))],
            groundtruth,
        )
        ex.add_result("baseline", base_rec)
        ex.add_result("model", recommendations)
        assert ex.results.loc["baseline", "Precision-Median@3"] == pytest.approx(0.333333, abs=1e-5)
        assert ex.results.loc["model", "Precision-Median@3"] == pytest.approx(0.666667, abs=1e-5)
        assert ex.results.loc["model", "Precision-ConfidenceInterval@3"] == pytest.approx(
            0.217774, abs=1e-5
        )


class TestBasicMetrics:
    def test_precision_recall_hand(self):
        recs = {1: [(10, 0.9), (20, 0.8), (30, 0.7)]}
        gt = {1: [10, 30, 99]}
        assert Precision(2)(recs, gt)["Precision@2"] == 0.5
        assert Recall(2)(recs, gt)["Recall@2"] == pytest.approx(1 / 3)
        assert Recall(3)(recs, gt)["Recall@3"] == pytest.approx(2 / 3)

    def test_hitrate_mrr(self):
        recs = {1: [(10, 0.9), (20, 0.8)], 2: [(30, 0.9), (40, 0.8)]}
        gt = {1: [20], 2: [99]}
        assert HitRate(2)(recs, gt)["HitRate@2"] == 0.5
        assert MRR(2)(recs, gt)["MRR@2"] == 0.25

    def test_map_single_user(self):
        recs = {1: [(1, 0.9), (2, 0.8), (3, 0.7)]}
        gt = {1: [1, 3]}
        # AP@3 = (1/1 + 2/3)/2
        assert MAP(3)(recs, gt)["MAP@3"] == pytest.approx((1 + 2 / 3) / 2)

    def test_rocauc(self):
        recs = {1: [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)]}
        gt = {1: [1, 2]}
        assert RocAuc(4)(recs, gt)["RocAuc@4"] == 1.0

    def test_user_without_recs_counts_zero(self):
        recs = {1: [(10, 1.0)]}
        gt = {1: [10], 2: [20]}
        assert Precision(1)(recs, gt)["Precision@1"] == 0.5

    def test_duplicates_warn(self):
        recs = pd.DataFrame(
            {"query_id": [1, 1], "item_id": [5, 5], "rating": [0.5, 0.4]}
        )
        gt = pd.DataFrame({"query_id": [1], "item_id": [5]})
        with pytest.warns(MetricDuplicatesWarning):
            HitRate(1)(recs, gt)

    def test_per_user_mode(self):
        recs = {1: [(10, 1.0)], 2: [(20, 1.0)]}
        gt = {1: [10], 2: [99]}
        res = HitRate(1, mode=PerUser())(recs, gt)
        assert res["HitRate-PerUser@1"] == {1: 1.0, 2: 0.0}

    def test_topk_validation(self):
        with pytest.raises(ValueError):
            Precision("five")
        with pytest.raises(ValueError):
            Precision([1, "two"])


class TestBeyondAccuracy:
    def test_coverage(self, recommendations, train):
        res = Coverage(3)(recommendations, train)
        # top-3 recs items: u1 {3,7,10}, u2 {5,8,11}, u3 {4,9,2}; train catalog has 9 items
        covered = {3, 5, 8, 11, 4, 9, 2}
        assert res["Coverage@3"] == pytest.approx(len(covered) / 9)

    def test_novelty(self):
        recs = {1: [(10, 0.9), (20, 0.8)]}
        train = {1: [10]}
        assert Novelty(2)(recs, train)["Novelty@2"] == 0.5

    def test_unexpectedness(self):
        recs = {1: [(1, 0.9), (2, 0.8)]}
        base = {1: [(1, 0.9), (3, 0.8)]}
        assert Unexpectedness(2)(recs, base)["Unexpectedness@2"] == 0.5

    def test_categorical_diversity(self):
        recs = {1: [("a", 0.9), ("a", 0.8), ("b", 0.7)]}
        res = CategoricalDiversity([2, 3])(recs)
        assert res["CategoricalDiversity@2"] == 0.5
        assert res["CategoricalDiversity@3"] == pytest.approx(2 / 3)


class TestOfflineMetrics:
    def test_multi_metric(self, recommendations, groundtruth, train, base_rec):
        result = OfflineMetrics(
            [Precision(2), Recall(2), NDCG(2), Coverage(2), Novelty(2), Unexpectedness(2)]
        )(recommendations, groundtruth, train, base_rec)
        assert "Precision@2" in result
        assert "Coverage@2" in result
        assert "Unexpectedness@2" in result

    def test_named_base_recommendations(self, recommendations, groundtruth, base_rec):
        result = OfflineMetrics([Precision(2), Unexpectedness(2)])(
            recommendations, groundtruth, base_recommendations={"knn": base_rec}
        )
        assert "Unexpectedness_knn@2" in result

    def test_missing_train_raises(self, recommendations, groundtruth):
        with pytest.raises(ValueError):
            OfflineMetrics([Coverage(2)])(recommendations, groundtruth)

    def test_missing_base_raises(self, recommendations, groundtruth):
        with pytest.raises(ValueError):
            OfflineMetrics([Unexpectedness(2)])(recommendations, groundtruth)
