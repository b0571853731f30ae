"""TPE-lite search quality: the built-in sampler must beat pure random
search on a known objective, and model.optimize() must improve a detuned
model (the budget/criterion path the round-1 examples never asserted on)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

import random

from replay_tpu.models.optimization.search import Study, Trial, suggest_params


def run_search(objective, space, budget, seed):
    study = Study(seed=seed)
    rng = random.Random(seed)
    for _ in range(budget):
        params = suggest_params(rng, space, study)
        study.trials.append(Trial(params=params, value=objective(params)))
    return study


def _branin_like(params):
    # smooth 2-D objective, max 0 at (3, -2)
    x, y = params["x"], params["y"]
    return -((x - 3.0) ** 2 + 0.5 * (y + 2.0) ** 2)


SPACE = {
    "x": {"type": "uniform", "args": [-10.0, 10.0]},
    "y": {"type": "uniform", "args": [-10.0, 10.0]},
}


def test_tpe_lite_beats_random_search():
    budget = 60
    tpe_best, rand_best = [], []
    for seed in range(5):
        study = run_search(_branin_like, SPACE, budget=budget, seed=seed)
        tpe_best.append(study.best_trial.value)
        rng = np.random.default_rng(seed)
        vals = [
            _branin_like({"x": rng.uniform(-10, 10), "y": rng.uniform(-10, 10)})
            for _ in range(budget)
        ]
        rand_best.append(max(vals))
    assert np.mean(tpe_best) > np.mean(rand_best), (tpe_best, rand_best)


def test_model_optimize_improves_detuned_knn():
    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (FeatureHint, FeatureInfo, FeatureSchema,
                                        FeatureSource, FeatureType)
    from replay_tpu.metrics import NDCG
    from replay_tpu.models import ItemKNN
    from replay_tpu.splitters import TimeSplitter

    rng = np.random.default_rng(2)
    rows = []
    for u in range(150):
        g = u % 5
        base_t = rng.integers(0, 100)
        for t in range(14):
            it = int(g * 30 + rng.integers(0, 30)) if rng.random() < 0.85 else int(rng.integers(0, 150))
            rows.append((u, it, 1.0, base_t + t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "rating", "timestamp"]).drop_duplicates(["query_id", "item_id"])
    schema = FeatureSchema([
        FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
        FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                    feature_source=FeatureSource.INTERACTIONS),
        FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                    feature_source=FeatureSource.INTERACTIONS),
    ])
    train, val = TimeSplitter(time_threshold=0.25, query_column="query_id").split(log)
    train_ds = Dataset(schema, train, check_consistency=False)
    val_ds = Dataset(schema, val, check_consistency=False)

    def ndcg_of(model):
        model.fit(train_ds)
        recs = model.predict(train_ds, k=10, queries=val["query_id"].unique())
        return NDCG(10)(recs, val)["NDCG@10"]

    detuned = ItemKNN(num_neighbours=1, shrink=100)
    base = ndcg_of(detuned)

    tuned_model = ItemKNN(num_neighbours=1, shrink=100)
    best = tuned_model.optimize(train_ds, val_ds, budget=10, criterion=NDCG, k=10)
    assert set(best) <= {"num_neighbours", "shrink", "weighting"}
    tuned_model.set_params(**best)
    tuned = ndcg_of(tuned_model)
    assert tuned > base, (tuned, base)


class _FixedTrial:
    """Minimal optuna-trial stand-in returning preset params."""

    def __init__(self, params):
        self.params = params

    def suggest_categorical(self, name, args):
        return self.params[name]

    def suggest_int(self, name, low, high, log=False):
        return self.params[name]

    def suggest_float(self, name, low, high, log=False):
        return self.params[name]


def test_itemknn_objective_refit_free_matches_refit(tiny_objective_data=None):
    """ItemKNNObjective (fit once at max num_neighbours, re-truncate per
    trial) must score every trial identically to the refit-per-trial
    ObjectiveWrapper (reference capability: optuna_objective.py:151)."""
    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (FeatureHint, FeatureInfo, FeatureSchema,
                                        FeatureSource, FeatureType)
    from replay_tpu.metrics import NDCG
    from replay_tpu.models import ItemKNN
    from replay_tpu.models.optimization import ItemKNNObjective, ObjectiveWrapper
    from replay_tpu.splitters import TimeSplitter

    rng = np.random.default_rng(4)
    rows = []
    for u in range(80):
        g = u % 4
        for t in range(12):
            it = int(g * 25 + rng.integers(0, 25)) if rng.random() < 0.8 else int(rng.integers(0, 100))
            rows.append((u, it, 1.0, t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "rating", "timestamp"]).drop_duplicates(["query_id", "item_id"])
    schema = FeatureSchema([
        FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
        FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                    feature_source=FeatureSource.INTERACTIONS),
        FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                    feature_source=FeatureSource.INTERACTIONS),
    ])
    train, val = TimeSplitter(time_threshold=0.25, query_column="query_id").split(log)
    train_ds = Dataset(schema, train, check_consistency=False)
    val_ds = Dataset(schema, val, check_consistency=False)

    space = {"num_neighbours": {"type": "int", "args": [1, 20]}}
    fast = ItemKNNObjective(ItemKNN(), train_ds, val_ds, criterion=NDCG, k=5,
                            search_space=space)
    for nn in (1, 3, 7, 20):
        slow = ObjectiveWrapper(ItemKNN(), train_ds, val_ds, criterion=NDCG, k=5,
                                search_space=space)
        v_slow = slow(_FixedTrial({"num_neighbours": nn}))
        v_fast = fast(_FixedTrial({"num_neighbours": nn}))
        assert v_fast == pytest.approx(v_slow, abs=1e-9), (nn, v_fast, v_slow)
