"""Unexpectedness (reference: replay/metrics/unexpectedness.py:6)."""

from typing import List, Optional

import pandas as pd

from replay_tpu.metrics.base_metric import (
    Metric,
    MetricsDataFrameLike,
    MetricsReturnType,
)


class Unexpectedness(Metric):
    """Fraction of top-k recommendations not produced by a baseline model."""

    def __call__(
        self,
        recommendations: MetricsDataFrameLike,
        base_recommendations: MetricsDataFrameLike,
    ) -> MetricsReturnType:
        self._check_dataframes_equal_types(recommendations, base_recommendations)
        recommendations = (
            self._convert_pandas_to_dict_with_score(recommendations)
            if isinstance(recommendations, pd.DataFrame)
            else self._convert_dict_to_dict_with_score(recommendations)
        )
        self._check_duplicates_dict(recommendations)
        base_recommendations = (
            self._convert_pandas_to_dict_with_score(base_recommendations)
            if isinstance(base_recommendations, pd.DataFrame)
            else self._convert_dict_to_dict_with_score(base_recommendations)
        )
        self._check_duplicates_dict(base_recommendations)
        return self._dict_call(
            list(recommendations),
            recs=recommendations,
            base_recs=base_recommendations,
        )

    @staticmethod
    def _get_metric_value_by_user(
        ks: List[int], base_recs: Optional[list], recs: Optional[list]
    ) -> List[float]:
        if not base_recs or not recs:
            return [0.0 for _ in ks]
        return [1.0 - len(set(recs[:k]) & set(base_recs[:k])) / k for k in ks]
