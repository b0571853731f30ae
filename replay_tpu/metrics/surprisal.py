"""Surprisal (reference: replay/metrics/surprisal.py:14)."""

from typing import Dict, List

import numpy as np
import pandas as pd

from replay_tpu.metrics.base_metric import (
    Metric,
    MetricsDataFrameLike,
    MetricsReturnType,
)


class Surprisal(Metric):
    """Mean self-information of recommended items.

    Item weight = log2(n_users / n_users_who_interacted) / log2(n_users);
    items unseen in train get weight 1.
    """

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

        weights = self._get_recommendation_weights(recommendations, train)
        return self._dict_call(
            list(recommendations),
            pred_item_id=recommendations,
            pred_weight=weights,
        )

    def _get_recommendation_weights(self, recommendations: dict, train: dict) -> dict:
        n_users = len(train)
        users_per_item: Dict = {}
        for user, items in train.items():
            for item in set(items):
                users_per_item[item] = users_per_item.get(item, 0) + 1
        log_n = np.log2(n_users) if n_users > 1 else 1.0
        item_weight = {
            item: np.log2(n_users / cnt) / log_n for item, cnt in users_per_item.items()
        }
        return {
            user: [item_weight.get(item, 1.0) for item in items]
            for user, items in recommendations.items()
        }

    @staticmethod
    def _get_metric_value_by_user(
        ks: List[int], pred_item_ids: list, pred_weights: list
    ) -> List[float]:
        if not pred_item_ids:
            return [0.0 for _ in ks]
        csum = np.cumsum(pred_weights)
        out = []
        for k in ks:
            n = min(k, len(pred_weights))
            out.append(float(csum[n - 1]) / k if n else 0.0)
        return out
