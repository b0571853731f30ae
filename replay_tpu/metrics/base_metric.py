"""Metric base class.

Reworks the reference's triple spark/polars/dict dispatch (reference:
replay/metrics/base_metric.py:34-389) into one path: inputs (pandas frames or
dicts) are normalized to per-user item lists sorted by (score desc, item
desc); per-user kernels are numpy-vectorized; aggregation goes through
CalculationDescriptor.
"""

import warnings
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Mapping, Union

import numpy as np
import pandas as pd

from replay_tpu.metrics.descriptors import CalculationDescriptor, Mean

MetricsDataFrameLike = Union[pd.DataFrame, dict]
MetricsMeanReturnType = Mapping[str, float]
MetricsPerUserReturnType = Mapping[str, Mapping[Any, float]]
MetricsReturnType = Union[MetricsMeanReturnType, MetricsPerUserReturnType]


class MetricDuplicatesWarning(Warning):
    """Recommendations contain duplicate (query, item) pairs."""


class RankingPrep:
    """Shared padded-array view of (recommendations, ground_truth).

    Replaces the per-user dict-of-lists conversion with one relational pass:
    recommendations are ranked per user by (score desc, item desc), truncated
    to ``max_k``, and joined against the deduplicated ground truth to produce
    a dense ``hits`` [n_users, max_k] matrix.  Every ranking metric is then a
    vectorized numpy expression over this matrix — the analog of the
    reference's Scala UDF layer (reference:
    scala/.../ScalaPySparkUDFs.scala:9-160), built once and shared across all
    metrics in an OfflineMetrics pass.
    """

    def __init__(
        self,
        recommendations: pd.DataFrame,
        ground_truth: pd.DataFrame,
        query_column: str,
        item_column: str,
        rating_column: str,
        max_k: int,
    ) -> None:
        q, i, r = query_column, item_column, rating_column
        self.max_k = max_k
        self.had_duplicates = bool(recommendations.duplicated([q, i]).any())

        self.users = np.unique(ground_truth[q].to_numpy())
        n_users = len(self.users)

        recs = recommendations.sort_values([r, i], ascending=False, kind="stable")
        rank = recs.groupby(q, sort=False).cumcount().to_numpy()
        rec_q = recs[q].to_numpy()
        upos = np.searchsorted(self.users, rec_q)
        upos_c = np.minimum(upos, max(n_users - 1, 0))
        known = (upos < n_users) & (self.users[upos_c] == rec_q) if n_users else np.zeros(len(rec_q), bool)
        keep = known & (rank < max_k)

        kept_row = upos[keep]
        kept_col = rank[keep]
        gt_dedup = ground_truth.drop_duplicates([q, i])
        # membership via a left merge on (query, item) — no per-user sets
        kept_pairs = pd.DataFrame(
            {q: rec_q[keep], i: recs[i].to_numpy()[keep]}
        )
        hit_flags = (
            kept_pairs.merge(gt_dedup[[q, i]].assign(_hit=True), on=[q, i], how="left")[
                "_hit"
            ]
            .notna()
            .to_numpy()
        )
        self.hits = np.zeros((n_users, max_k), dtype=bool)
        self.hits[kept_row, kept_col] = hit_flags
        self.pred_len = np.bincount(kept_row, minlength=n_users)

        self.gt_raw_len = (
            ground_truth[q].value_counts().reindex(self.users).fillna(0).to_numpy(np.int64)
        )
        self.gt_set_len = (
            gt_dedup[q].value_counts().reindex(self.users).fillna(0).to_numpy(np.int64)
        )
        self.hits_f = self.hits.astype(np.float64)
        self.csum = np.cumsum(self.hits_f, axis=1)
        # users with empty ground truth or no recommendations score 0
        self.nonzero = (self.gt_raw_len > 0) & (self.pred_len > 0)


def _normalize_value(value: Any) -> Any:
    if isinstance(value, np.generic):
        return value.item()
    return value


class Metric(ABC):
    """Base offline ranking metric."""

    def __init__(
        self,
        topk: Union[List[int], int],
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        mode: CalculationDescriptor = None,
    ) -> None:
        if isinstance(topk, list):
            for item in topk:
                if not isinstance(item, int):
                    msg = f"{item} is not int"
                    raise ValueError(msg)
        elif isinstance(topk, int):
            topk = [topk]
        else:
            msg = "topk not list or int"
            raise ValueError(msg)
        self.topk = sorted(topk)
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self._mode = mode if mode is not None else Mean()

    @property
    def __name__(self) -> str:
        mode_name = self._mode.__name__
        return str(type(self).__name__) + (f"-{mode_name}" if mode_name != "Mean" else "")

    # -- input normalization -------------------------------------------------
    def _check_dataframes_equal_types(self, a, b) -> None:
        if not isinstance(a, type(b)):
            msg = "All given data frames must have the same type"
            raise ValueError(msg)

    def _duplicate_warn(self):
        warnings.warn(
            "The recommendations contain duplicated users and items. "
            "The metrics may be higher than the actual ones.",
            MetricDuplicatesWarning,
        )

    def _check_duplicates_dict(self, recommendations: dict) -> None:
        for items in recommendations.values():
            if len(items) != len(set(items)):
                self._duplicate_warn()
                return

    def _convert_pandas_to_dict_with_score(self, data: pd.DataFrame) -> dict:
        return (
            data.sort_values(
                by=[self.rating_column, self.item_column], ascending=False, kind="stable"
            )
            .groupby(self.query_column)[self.item_column]
            .apply(list)
            .to_dict()
        )

    def _convert_dict_to_dict_with_score(self, data: dict) -> dict:
        converted = {}
        for user, items in data.items():
            if any(items[i - 1][1] < items[i][1] for i in range(1, len(items))):
                items = sorted(items, key=lambda x: x[1], reverse=True)
            converted[user] = [item for item, _ in items]
        return converted

    def _convert_pandas_to_dict_without_score(self, data: pd.DataFrame) -> dict:
        return data.groupby(self.query_column)[self.item_column].apply(list).to_dict()

    # -- main entry ------------------------------------------------------------
    def __call__(
        self,
        recommendations: MetricsDataFrameLike,
        ground_truth: MetricsDataFrameLike,
    ) -> MetricsReturnType:
        """Compute the metric.

        ``recommendations``: frame with (query, item, score) or dict
        query -> [(item, score), ...].  ``ground_truth``: frame with (query,
        item) or dict query -> [items].
        """
        self._check_dataframes_equal_types(recommendations, ground_truth)
        is_pandas = isinstance(recommendations, pd.DataFrame)
        if is_pandas and hasattr(self, "_get_metric_values_batch") and len(ground_truth):
            prep = RankingPrep(
                recommendations,
                ground_truth,
                self.query_column,
                self.item_column,
                self.rating_column,
                max(self.topk),
            )
            return self._call_with_prep(prep)
        recommendations = (
            self._convert_pandas_to_dict_with_score(recommendations)
            if is_pandas
            else self._convert_dict_to_dict_with_score(recommendations)
        )
        self._check_duplicates_dict(recommendations)
        ground_truth = (
            self._convert_pandas_to_dict_without_score(ground_truth) if is_pandas else ground_truth
        )
        assert isinstance(ground_truth, dict)
        return self._dict_call(
            list(ground_truth),
            pred_item_id=recommendations,
            ground_truth=ground_truth,
        )

    def _call_with_prep(self, prep: "RankingPrep") -> MetricsReturnType:
        """Vectorized evaluation over a shared RankingPrep (pandas fast path)."""
        if prep.had_duplicates:
            self._duplicate_warn()
        distribution = self._get_metric_values_batch(self.topk, prep)  # [U, n_ks]
        if self._mode.__name__ == "PerUser":
            per_user = {
                user: list(distribution[row]) for row, user in enumerate(prep.users)
            }
            return self._aggregate_results_per_user(per_user)
        metrics = [self._mode.cpu(distribution[:, k]) for k in range(distribution.shape[1])]
        return self._aggregate_results(metrics)

    def _dict_call(self, users: list, **kwargs: dict) -> MetricsReturnType:
        """Evaluate the per-user kernel for every user; aggregate via the mode."""
        if not users:
            # the reference raises the same class here, just cryptically
            # ("need at least one array to stack") — keep the error, say why
            msg = (
                f"{self.__name__}: ground truth is empty — no queries to "
                "evaluate (check your split/filters)"
            )
            raise ValueError(msg)
        keys_list = sorted(kwargs.keys())
        distribution_per_user: Dict[Any, List[float]] = {}
        for user in users:
            args = [kwargs[key].get(user) for key in keys_list]
            distribution_per_user[user] = self._get_metric_value_by_user(self.topk, *args)
        if self._mode.__name__ == "PerUser":
            return self._aggregate_results_per_user(distribution_per_user)
        distribution = np.stack(list(distribution_per_user.values()))
        metrics = [self._mode.cpu(distribution[:, k]) for k in range(distribution.shape[1])]
        return self._aggregate_results(metrics)

    def _aggregate_results_per_user(self, distribution_per_user) -> MetricsPerUserReturnType:
        res: Dict[str, Dict[Any, float]] = {}
        for index, val in enumerate(self.topk):
            name = f"{self.__name__}@{val}"
            res[name] = {
                user: _normalize_value(vals[index]) for user, vals in distribution_per_user.items()
            }
        return res

    def _aggregate_results(self, metrics: list) -> MetricsMeanReturnType:
        return {
            f"{self.__name__}@{val}": _normalize_value(metrics[i])
            for i, val in enumerate(self.topk)
        }

    @staticmethod
    @abstractmethod
    def _get_metric_value_by_user(ks: List[int], *args) -> List[float]:
        """Per-user metric values for each cutoff k."""
        raise NotImplementedError
