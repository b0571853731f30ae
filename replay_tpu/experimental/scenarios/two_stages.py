"""Two-stage scenario: candidate generation → learned reranking.

TPU-native analog of the reference (reference:
replay/experimental/scenarios/two_stages/two_stages_scenario.py:112
TwoStagesScenario + reranker.py).  The reference's second level is a
LightAutoML model over enriched candidate features; here the reranker is a
sklearn HistGradientBoostingClassifier (in-image), trained on first-level
candidates labeled by held-out interactions, with the same feature
enrichment idea: first-level scores + per-user/per-item log statistics.

Flow (reference `_fit` :476):
1. split train into (first_level_train, second_level_train);
2. fit first-level model(s) on first_level_train;
3. generate k_first candidates per user; label positives from
   second_level_train; negative-sample the rest;
4. enrich with features → fit the reranker;
5. predict = candidates from first level → rerank scores.
"""

from typing import List, Optional

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import BaseRecommender, HybridRecommender
from replay_tpu.models.pop_rec import PopRec
from replay_tpu.splitters.ratio_splitter import RatioSplitter


class TwoStagesScenario(HybridRecommender):
    """Candidate generation + gradient-boosted reranking."""

    can_predict_cold_queries = True

    def __init__(
        self,
        first_level_models: Optional[List[BaseRecommender]] = None,
        fallback_model: Optional[BaseRecommender] = None,
        train_splitter: Optional[RatioSplitter] = None,
        num_negatives: int = 100,
        k_first_level: int = 100,
        seed: int = 123,
    ):
        self.first_level_models = first_level_models or [PopRec()]
        self.fallback_model = fallback_model
        self.train_splitter = train_splitter
        self.num_negatives = num_negatives
        self.k_first_level = k_first_level
        self.seed = seed
        self.reranker = None
        self._stats: Optional[dict] = None

    @property
    def _init_args(self):
        return {
            "num_negatives": self.num_negatives,
            "k_first_level": self.k_first_level,
            "seed": self.seed,
        }

    # ----------------------------------------------------------- features
    def _log_stats(self, interactions: pd.DataFrame) -> dict:
        """Per-user/per-item activity statistics (the reference's
        HistoryBasedFeaturesProcessor idea, two_stages_scenario.py:236)."""
        user_stats = interactions.groupby(self.query_column).agg(
            u_count=(self.item_column, "count")
        )
        item_stats = interactions.groupby(self.item_column).agg(
            i_count=(self.query_column, "count")
        )
        return {"user": user_stats, "item": item_stats}

    def _feature_frame(self, candidates: pd.DataFrame) -> np.ndarray:
        frame = candidates.join(self._stats["user"], on=self.query_column).join(
            self._stats["item"], on=self.item_column
        )
        frame = frame.fillna(0.0)
        score_cols = [c for c in frame.columns if c.startswith("score_")]
        features = frame[score_cols + ["u_count", "i_count"]].to_numpy(dtype=np.float64)
        return features

    # ---------------------------------------------------------------- fit
    def _candidates(self, dataset: Dataset, queries, k: int) -> pd.DataFrame:
        """Union of per-model top-k candidates with per-model score columns."""
        merged: Optional[pd.DataFrame] = None
        for idx, model in enumerate(self.first_level_models):
            recs = model._predict_wrap(
                dataset, k=k, queries=queries, filter_seen_items=True
            )
            recs = recs.rename(columns={self.rating_column: f"score_{idx}"})
            merged = (
                recs
                if merged is None
                else merged.merge(
                    recs, on=[self.query_column, self.item_column], how="outer"
                )
            )
        return merged.fillna(merged.min(numeric_only=True))

    def _split(self, interactions: pd.DataFrame):
        """Per-user 50/50 split (chronological when a timestamp exists)."""
        if self.train_splitter is not None:
            return self.train_splitter.split(interactions)
        sort_cols = [self.query_column]
        if self.timestamp_column in interactions.columns:
            sort_cols.append(self.timestamp_column)
        ordered = interactions.sort_values(sort_cols, kind="stable")
        rank = ordered.groupby(self.query_column).cumcount()
        counts = ordered.groupby(self.query_column)[self.query_column].transform("count")
        is_second = rank >= (counts // 2)
        return ordered[~is_second], ordered[is_second]

    def _fit(self, dataset: Dataset) -> None:
        first_train, second_train = self._split(dataset.interactions)
        first_ds = Dataset(dataset.feature_schema, first_train, check_consistency=False)

        for model in self.first_level_models:
            model._fit_wrap(first_ds)
        self._stats = self._log_stats(first_train)

        queries = np.unique(second_train[self.query_column].to_numpy())
        candidates = self._candidates(first_ds, queries, self.k_first_level)
        positives = set(
            map(tuple, second_train[[self.query_column, self.item_column]].to_numpy())
        )
        labels = np.fromiter(
            (
                (q, i) in positives
                for q, i in candidates[[self.query_column, self.item_column]].to_numpy()
            ),
            dtype=bool,
            count=len(candidates),
        )
        # balance: keep all positives + sampled negatives per user
        rng = np.random.default_rng(self.seed)
        neg_idx = np.flatnonzero(~labels)
        keep_neg = rng.permutation(neg_idx)[
            : min(len(neg_idx), self.num_negatives * max(labels.sum(), 1))
        ]
        keep = np.concatenate([np.flatnonzero(labels), keep_neg])
        features = self._feature_frame(candidates.iloc[keep])
        target = labels[keep]

        from sklearn.ensemble import HistGradientBoostingClassifier

        self.reranker = HistGradientBoostingClassifier(random_state=self.seed)
        self.reranker.fit(features, target)
        self._first_ds = first_ds

    # ------------------------------------------------------------- predict
    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        candidates = self._candidates(dataset, queries, self.k_first_level)
        if items is not None:
            candidates = candidates[candidates[self.item_column].isin(items)]
        features = self._feature_frame(candidates)
        scores = self.reranker.predict_proba(features)[:, 1]
        out = candidates[[self.query_column, self.item_column]].copy()
        out[self.rating_column] = scores
        if filter_seen_items and dataset is not None:
            seen = set(
                map(
                    tuple,
                    dataset.interactions[[self.query_column, self.item_column]].to_numpy(),
                )
            )
            mask = [
                (q, i) not in seen
                for q, i in out[[self.query_column, self.item_column]].to_numpy()
            ]
            out = out[mask]
        out = (
            out.sort_values(
                [self.query_column, self.rating_column, self.item_column],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby(self.query_column, sort=False)
            .head(k)
        )
        return out.reset_index(drop=True)
