"""Hyperparameter optimization for recommender models.

TPU-native analog of the reference's optuna machinery (reference:
replay/models/optimization/optuna_mixin.py:17,168,244 OptunaMixin and
optuna_objective.py:27,52,96 ObjectiveWrapper / suggest_params /
eval_quality).  optuna is an *optional* backend here (gated by
``OPTUNA_AVAILABLE``); the built-in sampler is a TPE-lite: random search
for ``n_startup`` trials, then candidates are drawn and ranked by the ratio
of Gaussian-kernel densities of the good vs. bad trial sets — the core TPE
idea (Bergstra et al. 2011) without the optuna dependency.

Search-space grammar matches the reference's per-model ``_search_space``
dicts: ``{"type": "int" | "uniform" | "loguniform" | "loguniform_int" |
"categorical", "args": [...]}``.
"""

import math
import random
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from replay_tpu.utils.types import OPTUNA_AVAILABLE


@dataclass
class Trial:
    params: Dict[str, Any]
    value: Optional[float] = None


@dataclass
class Study:
    """Minimal study record (optuna-study analog)."""

    direction: str = "maximize"
    trials: List[Trial] = field(default_factory=list)
    seed: int = 0

    @property
    def best_trial(self) -> Trial:
        finished = [t for t in self.trials if t.value is not None]
        if not finished:
            msg = "No finished trials"
            raise ValueError(msg)
        key = (lambda t: t.value) if self.direction == "maximize" else (lambda t: -t.value)
        return max(finished, key=key)

    @property
    def best_params(self) -> Dict[str, Any]:
        return self.best_trial.params


def _sample_one(rng: random.Random, name: str, spec: Dict) -> Any:
    kind = spec["type"]
    args = spec["args"]
    if kind == "categorical":
        return rng.choice(args)
    low, high = args[0], args[1]
    if kind == "int":
        return rng.randint(int(low), int(high))
    if kind == "uniform":
        return rng.uniform(low, high)
    if kind == "loguniform":
        return math.exp(rng.uniform(math.log(low), math.log(high)))
    if kind == "loguniform_int":
        return int(round(math.exp(rng.uniform(math.log(low), math.log(high)))))
    msg = f"Unknown search space type {kind}"
    raise ValueError(msg)


def suggest_params(
    rng: random.Random, search_space: Dict[str, Dict], study: Study, n_startup: int = 5
) -> Dict[str, Any]:
    """Random for the first ``n_startup`` trials, then TPE-lite."""
    finished = [t for t in study.trials if t.value is not None]
    if len(finished) < n_startup:
        return {name: _sample_one(rng, name, spec) for name, spec in search_space.items()}

    # split into good/bad by the top-25% quantile
    ordered = sorted(finished, key=lambda t: t.value, reverse=(study.direction == "maximize"))
    n_good = max(1, len(ordered) // 4)
    good, bad = ordered[:n_good], ordered[n_good:]

    def to_unit(name, spec, value):
        kind = spec["type"]
        args = spec["args"]
        if kind == "categorical":
            return args.index(value) / max(len(args) - 1, 1)
        low, high = args
        if kind in ("loguniform", "loguniform_int"):
            return (math.log(value) - math.log(low)) / max(math.log(high) - math.log(low), 1e-12)
        return (value - low) / max(high - low, 1e-12)

    def density(trials, name, spec, value):
        if not trials:
            return 1e-12
        x = to_unit(name, spec, value)
        bw = 0.2
        return sum(
            math.exp(-((x - to_unit(name, spec, t.params[name])) ** 2) / (2 * bw * bw))
            for t in trials
            if name in t.params
        ) / len(trials) + 1e-12

    best_cand, best_score = None, -math.inf
    for _ in range(24):
        cand = {name: _sample_one(rng, name, spec) for name, spec in search_space.items()}
        score = sum(
            math.log(density(good, name, spec, cand[name]))
            - math.log(density(bad, name, spec, cand[name]))
            for name, spec in search_space.items()
        )
        if score > best_score:
            best_cand, best_score = cand, score
    return best_cand


class OptimizeMixin:
    """Gives every model ``optimize(train, test, param_borders, criterion,
    k, budget)`` (reference: optuna_mixin.py:168)."""

    _search_space: Optional[Dict[str, Dict]] = None
    _study: Optional[Study] = None

    def _effective_search_space(
        self, param_borders: Optional[Dict[str, Sequence]]
    ) -> Dict[str, Dict]:
        if self._search_space is None:
            msg = f"{self} has no search space to optimize"
            raise ValueError(msg)
        space = {k: dict(v) for k, v in self._search_space.items()}
        if param_borders:
            for param, borders in param_borders.items():
                if param not in space:
                    msg = f"Hyper parameter {param} is not defined for {self}"
                    raise ValueError(msg)
                if space[param]["type"] != "categorical" and len(borders) != 2:
                    msg = f"Borders for {param} must be a [low, high] pair"
                    raise ValueError(msg)
                space[param] = {**space[param], "args": list(borders)}
        return space

    def optimize(
        self,
        train_dataset,
        test_dataset,
        param_borders: Optional[Dict[str, Sequence]] = None,
        criterion=None,
        k: int = 10,
        budget: int = 10,
        new_study: bool = True,
    ) -> Dict[str, Any]:
        """Search hyperparameters maximizing ``criterion@k`` on the test split.

        :param criterion: metric CLASS (e.g. NDCG) — instantiated as
            criterion(k), reference semantics.
        :returns: best parameter dict (also applied via ``set_params``... no —
            the reference returns params without applying; same here).
        """
        from replay_tpu.metrics import NDCG

        criterion = criterion or NDCG
        space = self._effective_search_space(param_borders)

        if OPTUNA_AVAILABLE:  # pragma: no cover - optuna absent in image
            return self._optimize_optuna(
                train_dataset, test_dataset, space, criterion, k, budget, new_study
            )

        if new_study or self._study is None:
            self._study = Study(seed=getattr(self, "_seed", 0) or 0)
        study = self._study
        rng = random.Random(study.seed + len(study.trials))

        # seed trial: current init params if they lie inside the space
        if not study.trials:
            current = {
                name: value
                for name, value in self._init_args.items()
                if name in space
            }
            if len(current) == len(space):
                study.trials.append(
                    Trial(params=current, value=self._eval_trial(
                        current, train_dataset, test_dataset, criterion, k
                    ))
                )

        for _ in range(budget):
            params = suggest_params(rng, space, study)
            value = self._eval_trial(params, train_dataset, test_dataset, criterion, k)
            study.trials.append(Trial(params=params, value=value))
        return study.best_params

    def _eval_trial(self, params, train_dataset, test_dataset, criterion, k) -> float:
        self.set_params(**params)
        self.fit(train_dataset)
        return eval_quality(self, train_dataset, test_dataset, criterion, k)

    def _optimize_optuna(
        self, train_dataset, test_dataset, space, criterion, k, budget, new_study
    ):  # pragma: no cover - optuna absent in image
        import optuna

        if new_study or self._study is None:
            self._study = optuna.create_study(
                direction="maximize", sampler=optuna.samplers.TPESampler()
            )

        def objective(trial):
            params = {}
            for name, spec in space.items():
                kind, args = spec["type"], spec["args"]
                if kind == "categorical":
                    params[name] = trial.suggest_categorical(name, args)
                elif kind == "int":
                    params[name] = trial.suggest_int(name, args[0], args[1])
                elif kind == "loguniform_int":
                    params[name] = trial.suggest_int(name, args[0], args[1], log=True)
                elif kind == "loguniform":
                    params[name] = trial.suggest_float(name, args[0], args[1], log=True)
                else:
                    params[name] = trial.suggest_float(name, args[0], args[1])
            return self._eval_trial(params, train_dataset, test_dataset, criterion, k)

        self._study.optimize(objective, n_trials=budget)
        return self._study.best_params


class ObjectiveWrapper:
    """Standalone optuna objective (reference:
    replay/models/optimization/optuna_objective.py:27 ObjectiveWrapper) —
    the same trial→score callable ``OptimizeMixin.optimize`` builds
    internally, exposed so callers can drive their own optuna study.

    :param model: a fitted-or-not recommender with ``set_params``/``fit``/
        ``predict`` and a ``_search_space``.
    :param criterion: metric CLASS (e.g. NDCG), instantiated as criterion(k).
    """

    def __init__(self, model, train_dataset, test_dataset, criterion=None,
                 k: int = 10, search_space: Optional[Dict[str, Dict]] = None):
        self.model = model
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.criterion = criterion
        self.k = k
        self.search_space = (
            search_space
            if search_space is not None
            else model._effective_search_space(None)
        )

    def __call__(self, trial) -> float:
        params: Dict[str, Any] = {}
        for name, spec in self.search_space.items():
            kind, args = spec["type"], spec["args"]
            if kind == "categorical":
                params[name] = trial.suggest_categorical(name, args)
            elif kind == "int":
                params[name] = trial.suggest_int(name, args[0], args[1])
            elif kind == "loguniform_int":
                params[name] = trial.suggest_int(name, args[0], args[1], log=True)
            elif kind == "loguniform":
                params[name] = trial.suggest_float(name, args[0], args[1], log=True)
            else:
                params[name] = trial.suggest_float(name, args[0], args[1])
        return self.model._eval_trial(
            params, self.train_dataset, self.test_dataset, self.criterion, self.k
        )


def eval_quality(model, train_dataset, test_dataset, criterion, k: int = 10) -> float:
    """Score a FITTED model on the held-out interactions (reference:
    replay/models/optimization/optuna_objective.py:96 eval_quality)."""
    test_queries = test_dataset.interactions[
        test_dataset.feature_schema.query_id_column
    ].drop_duplicates()
    recs = model.predict(train_dataset, k=k, queries=test_queries)
    schema = test_dataset.feature_schema
    metric = criterion(
        k,
        query_column=schema.query_id_column,
        item_column=schema.item_id_column,
        rating_column=schema.interactions_rating_column or "rating",
    )
    result = metric(recs, test_dataset.interactions)
    return float(next(iter(result.values())))


class ItemKNNObjective(ObjectiveWrapper):
    """Refit-free objective for ItemKNN (reference:
    replay/models/optimization/optuna_objective.py:151): the Gram matrix is
    computed ONCE at the search-space maximum ``num_neighbours``; each trial
    re-truncates the cached dense similarity instead of refitting (top-k of a
    top-K truncation equals top-k of the full matrix for k <= K, incl. the
    reference's column-index tie-break — see ItemKNN._truncate_topk)."""

    def __init__(self, model, train_dataset, test_dataset, criterion=None,
                 k: int = 10, search_space: Optional[Dict[str, Dict]] = None):
        super().__init__(model, train_dataset, test_dataset, criterion, k, search_space)
        nn_spec = self.search_space.get("num_neighbours")
        self._max_neighbours = (
            int(nn_spec["args"][1]) if nn_spec else int(model.num_neighbours)
        )
        self._cached_sim = None

    def __call__(self, trial) -> float:
        import numpy as np

        if self._cached_sim is None:
            self.model.num_neighbours = self._max_neighbours
            self.model.fit(self.train_dataset)
            self._cached_sim = np.array(self.model._sim_dense)
        params: Dict[str, Any] = {}
        for name, spec in self.search_space.items():
            kind, args = spec["type"], spec["args"]
            if kind == "categorical":
                params[name] = trial.suggest_categorical(name, args)
            elif kind in ("int", "loguniform_int"):
                params[name] = trial.suggest_int(name, args[0], args[1], log=(kind == "loguniform_int"))
            else:
                params[name] = trial.suggest_float(name, args[0], args[1], log=(kind == "loguniform"))
        num_neighbours = int(params.get("num_neighbours", self.model.num_neighbours))
        if num_neighbours > self._max_neighbours:
            num_neighbours = self._max_neighbours
        self.model.num_neighbours = num_neighbours
        self.model._set_similarity_dense(
            type(self.model)._truncate_topk(self._cached_sim.copy(), num_neighbours)
        )
        return eval_quality(
            self.model, self.train_dataset, self.test_dataset, self.criterion, self.k
        )
