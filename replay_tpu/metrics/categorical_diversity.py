"""Categorical diversity (reference: replay/metrics/categorical_diversity.py:24)."""

from collections import defaultdict
from typing import List, Union

import numpy as np
import pandas as pd

from replay_tpu.metrics.base_metric import (
    Metric,
    MetricsDataFrameLike,
    MetricsPerUserReturnType,
    MetricsReturnType,
)
from replay_tpu.metrics.descriptors import CalculationDescriptor, Mean


class CategoricalDiversity(Metric):
    """Mean number of distinct categories in each user's top-k, divided by k."""

    def __init__(
        self,
        topk: Union[List[int], int],
        query_column: str = "query_id",
        category_column: str = "category_id",
        rating_column: str = "rating",
        mode: CalculationDescriptor = None,
    ) -> None:
        super().__init__(
            topk=topk,
            query_column=query_column,
            item_column=category_column,
            rating_column=rating_column,
            mode=mode,
        )
        self.category_column = category_column

    def __call__(self, recommendations: MetricsDataFrameLike) -> MetricsReturnType:
        """``recommendations``: (query, category, score) frame or dict
        query -> [(category, score), ...]."""
        recommendations = (
            self._convert_pandas_to_dict_with_score(recommendations)
            if isinstance(recommendations, pd.DataFrame)
            else self._convert_dict_to_dict_with_score(recommendations)
        )
        precalculated = self._precalculate_unique_cats(recommendations)
        if self._mode.__name__ == "PerUser":
            return self._compute_per_user(precalculated)
        return self._compute_agg(precalculated)

    @staticmethod
    def _precalculate_unique_cats(recommendations: dict) -> dict:
        answer = {}
        for user, cats in recommendations.items():
            unique = set()
            unique_len = []
            for cat in cats:
                unique.add(cat)
                unique_len.append(len(unique))
            answer[user] = unique_len
        return answer

    def _compute_per_user(self, precalculated: dict) -> MetricsPerUserReturnType:
        dist = defaultdict(list)
        for k in self.topk:
            for user, unique_cats in precalculated.items():
                dist[user].append(unique_cats[min(len(unique_cats), k) - 1] / k)
        return self._aggregate_results_per_user(dict(dist))

    def _compute_agg(self, precalculated: dict) -> MetricsReturnType:
        rows = []
        for unique_cats in precalculated.values():
            rows.append(
                [unique_cats[min(len(unique_cats), k) - 1] / k for k in self.topk]
            )
        distribution = np.stack(rows)
        metrics = [self._mode.cpu(distribution[:, i]) for i in range(distribution.shape[1])]
        return self._aggregate_results(metrics)

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], *args) -> List[float]:  # pragma: no cover
        """Diversity uses precalculated prefix counts; no standalone kernel."""
