"""Fallback scenario: main model + fallback fill for short rec lists.

TPU-native analog of the reference (reference: replay/scenarios/fallback.py:13
Fallback; merge helper replay/utils/spark_utils.py:480 fallback).  Hot
queries (≥ threshold interactions) get main-model recommendations; all
queries get fallback recommendations, whose scores are shifted below the
main model's minimum so merged ranking keeps main recs on top.
"""

from typing import Optional

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import BaseRecommender, get_unique_entities
from replay_tpu.models.pop_rec import PopRec


def fallback_merge(
    base: pd.DataFrame,
    fill: Optional[pd.DataFrame],
    k: int,
    query_column: str = "query_id",
    item_column: str = "item_id",
    rating_column: str = "rating",
) -> pd.DataFrame:
    """Fill users with < k base recs from ``fill``, scores shifted to sort
    below base (reference: replay/utils/spark_utils.py:480)."""
    if fill is None or len(fill) == 0:
        return base
    if len(base) == 0:
        merged = fill
    else:
        margin = 0.1
        diff = fill[rating_column].max() - base[rating_column].min()
        if diff >= 0:
            fill = fill.assign(**{rating_column: fill[rating_column] - diff - margin})
        merged = pd.concat([base, fill], ignore_index=True)
        merged = merged.sort_values(rating_column, ascending=False, kind="stable")
        merged = merged.drop_duplicates([query_column, item_column], keep="first")
    merged = (
        merged.sort_values(
            [query_column, rating_column, item_column],
            ascending=[True, False, True],
            kind="stable",
        )
        .groupby(query_column, sort=False)
        .head(k)
    )
    return merged.reset_index(drop=True)


class Fallback(BaseRecommender):
    """Main + fallback model combination with the recommender interface."""

    can_predict_cold_queries: bool = True

    def __init__(
        self,
        main_model: Optional[BaseRecommender] = None,
        fallback_model: Optional[BaseRecommender] = None,
        threshold: int = 0,
    ):
        self.threshold = threshold
        self.hot_queries: Optional[np.ndarray] = None
        # main_model is only None transiently while the registry restores a
        # saved Fallback (_load_model replaces both sub-models)
        self.main_model = main_model if main_model is not None else PopRec()
        self.fb_model = fallback_model if fallback_model is not None else PopRec()

    @property
    def _init_args(self):
        return {"threshold": self.threshold}

    def _get_save_state(self):
        return {"hot_queries": self.hot_queries}

    def _save_model(self, path: str, additional_params=None):
        from pathlib import Path as _Path

        from replay_tpu.utils import model_handler

        saved = super()._save_model(path, additional_params)
        model_handler.save(self.main_model, _Path(path) / "main", overwrite=True)
        model_handler.save(self.fb_model, _Path(path) / "fallback", overwrite=True)
        return saved

    def _load_model(self, path: str):
        from pathlib import Path as _Path

        from replay_tpu.utils import model_handler

        super()._load_model(path)
        main_dir = _Path(path) / "main"
        if main_dir.exists():
            self.main_model = model_handler.load(main_dir)
            self.fb_model = model_handler.load(_Path(path) / "fallback")

    def __str__(self):
        return f"Fallback_{self.main_model!s}_{self.fb_model!s}"

    def _hot_subset(self, dataset: Dataset) -> Dataset:
        inter = dataset.interactions
        counts = inter.groupby(dataset.feature_schema.query_id_column).size()
        hot = counts[counts >= self.threshold].index.to_numpy()
        hot_inter = inter[inter[dataset.feature_schema.query_id_column].isin(hot)]
        return Dataset(
            feature_schema=dataset.feature_schema,
            interactions=hot_inter,
            query_features=dataset.query_features,
            item_features=dataset.item_features,
            check_consistency=False,
        ), hot

    def fit(self, dataset: Dataset) -> None:
        hot_dataset, hot = self._hot_subset(dataset)
        self.hot_queries = hot
        self.main_model._fit_wrap(hot_dataset)
        self.fb_model._fit_wrap(dataset)
        # expose fit entities for the recommender interface
        self.fit_queries = self.fb_model.fit_queries
        self.fit_items = self.fb_model.fit_items
        self.query_column = self.fb_model.query_column
        self.item_column = self.fb_model.item_column
        self.rating_column = self.fb_model.rating_column

    def predict(
        self,
        dataset: Dataset,
        k: int,
        queries=None,
        items=None,
        filter_seen_items: bool = True,
    ) -> pd.DataFrame:
        if queries is None:
            queries = np.unique(
                dataset.interactions[self.query_column].to_numpy()
            )
        else:
            queries = get_unique_entities(queries, self.query_column)
        hot_dataset, hot = self._hot_subset(dataset)
        hot_queries = queries[np.isin(queries, hot)]

        hot_pred = (
            self.main_model._predict_wrap(
                dataset=hot_dataset,
                k=k,
                queries=hot_queries,
                items=items,
                filter_seen_items=filter_seen_items,
            )
            if len(hot_queries)
            else pd.DataFrame(
                {self.query_column: [], self.item_column: [], self.rating_column: []}
            )
        )
        cold_pred = self.fb_model._predict_wrap(
            dataset=dataset,
            k=k,
            queries=queries,
            items=items,
            filter_seen_items=filter_seen_items,
        )
        return fallback_merge(
            hot_pred, cold_pred, k, self.query_column, self.item_column, self.rating_column
        )

    def fit_predict(self, dataset: Dataset, k: int, **kwargs) -> pd.DataFrame:
        self.fit(dataset)
        return self.predict(dataset, k, **kwargs)

    def optimize(
        self,
        train_dataset,
        test_dataset,
        param_borders=None,
        criterion=None,
        k: int = 10,
        budget: int = 10,
        new_study: bool = True,
    ):
        """Optimize main then fallback models (reference:
        replay/scenarios/fallback.py:125); ``param_borders`` may carry
        ``{"main": ..., "fallback": ...}`` sub-dicts."""
        if param_borders is None:
            param_borders = {"main": None, "fallback": None}
        params = self.main_model.optimize(
            train_dataset, test_dataset, param_borders.get("main"), criterion, k, budget, new_study
        )
        self.main_model.set_params(**params)
        fb_params = None
        if self.fb_model._search_space is not None:
            fb_params = self.fb_model.optimize(
                train_dataset, test_dataset, param_borders.get("fallback"),
                criterion, k, budget, new_study,
            )
            self.fb_model.set_params(**fb_params)
        return params, fb_params

    def _fit(self, dataset: Dataset) -> None:
        self.main_model._fit_wrap(dataset)
        self.fb_model._fit_wrap(dataset)
