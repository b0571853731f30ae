"""Novelty (reference: replay/metrics/novelty.py:11)."""

from typing import List

import pandas as pd

from replay_tpu.metrics.base_metric import (
    Metric,
    MetricsDataFrameLike,
    MetricsReturnType,
)


class Novelty(Metric):
    """Fraction of top-k recommendations the user has not interacted with in train."""

    def __call__(
        self,
        recommendations: MetricsDataFrameLike,
        train: MetricsDataFrameLike,
    ) -> MetricsReturnType:
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
        return self._dict_call(
            list(train),
            pred_item_id=recommendations,
            train=train,
        )

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], pred: list, train: list) -> List[float]:
        if not train or not pred:
            return [1.0 for _ in ks]
        set_train = set(train)
        return [1.0 - len(set(pred[:k]) & set_train) / len(pred[:k]) for k in ks]
