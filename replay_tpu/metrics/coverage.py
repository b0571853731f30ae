"""Catalog coverage (reference: replay/metrics/coverage.py:17)."""

import functools
import operator
from typing import List, Union

import pandas as pd

from replay_tpu.metrics.base_metric import (
    Metric,
    MetricsDataFrameLike,
    MetricsReturnType,
)


class Coverage(Metric):
    """Share of distinct train items that appear in anyone's top-k."""

    def __init__(
        self,
        topk: Union[List[int], int],
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        allow_caching: bool = True,
    ) -> None:
        super().__init__(
            topk=topk,
            query_column=query_column,
            item_column=item_column,
            rating_column=rating_column,
        )
        self._allow_caching = allow_caching

    def __call__(
        self,
        recommendations: MetricsDataFrameLike,
        train: MetricsDataFrameLike,
    ) -> MetricsReturnType:
        """Compute coverage of ``train``'s item catalog by the recommendations."""
        self._check_dataframes_equal_types(recommendations, train)
        is_pandas = isinstance(recommendations, pd.DataFrame)
        recommendations = (
            self._convert_pandas_to_dict_with_score(recommendations)
            if is_pandas
            else self._convert_dict_to_dict_with_score(recommendations)
        )
        self._check_duplicates_dict(recommendations)
        train = self._convert_pandas_to_dict_without_score(train) if is_pandas else train
        assert isinstance(train, dict)
        return self._dict_call_coverage(recommendations, train)

    def _dict_call_coverage(self, recommendations: dict, train: dict) -> MetricsReturnType:
        train_items = set(functools.reduce(operator.iconcat, train.values(), []))
        len_train_items = len(train_items)
        metrics = []
        for k in self.topk:
            pred_items = set()
            for items in recommendations.values():
                pred_items.update(items[:k])
            metrics.append(len(pred_items & train_items) / len_train_items)
        return self._aggregate_results(metrics)

    @staticmethod
    def _get_metric_value_by_user(ks, *args) -> List[float]:  # pragma: no cover
        """Coverage is a catalog-level metric; no per-user kernel."""
