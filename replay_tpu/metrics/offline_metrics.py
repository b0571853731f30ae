"""Batch metric evaluator (reference: replay/metrics/offline_metrics.py:12)."""

import warnings
from typing import Dict, List, Optional, Union

import pandas as pd

from replay_tpu.metrics.base_metric import Metric, MetricsDataFrameLike


class OfflineMetrics:
    """Evaluate several metrics over one set of recommendations in one pass.

    Shares the converted per-user recommendation lists across all metrics
    instead of rebuilding them per metric.

    >>> import pandas as pd
    >>> from replay_tpu.metrics import Precision, Recall
    >>> gt = pd.DataFrame({"query_id": [1, 1, 2], "item_id": [10, 11, 12]})
    >>> recs = pd.DataFrame(
    ...     {"query_id": [1, 1, 2, 2], "item_id": [10, 11, 13, 12],
    ...      "rating": [0.9, 0.8, 0.7, 0.6]})
    >>> result = OfflineMetrics([Precision(2), Recall(2)])(recs, gt)
    >>> {k: round(v, 4) for k, v in result.items()}
    {'Precision@2': 0.75, 'Recall@2': 1.0}
    """

    _metrics_call_requirement_map: Dict[str, List[str]] = {
        "HitRate": ["ground_truth"],
        "MAP": ["ground_truth"],
        "NDCG": ["ground_truth"],
        "RocAuc": ["ground_truth"],
        "Coverage": ["train"],
        "Novelty": ["train"],
        "Surprisal": ["train"],
        "MRR": ["ground_truth"],
        "Precision": ["ground_truth"],
        "Recall": ["ground_truth"],
    }

    def __init__(
        self,
        metrics: List[Metric],
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        category_column: str = "category_id",
        allow_caching: bool = True,
    ):
        self.unexpectedness_metric: List[Metric] = []
        self.diversity_metric: List[Metric] = []
        self.main_metrics: List[Metric] = []
        self._allow_caching = allow_caching

        for metric in metrics:
            metric.query_column = query_column
            metric.item_column = item_column
            metric.rating_column = rating_column
            name = metric.__class__.__name__
            if name == "Unexpectedness":
                self.unexpectedness_metric.append(metric)
            elif name == "CategoricalDiversity":
                metric.category_column = category_column
                metric.item_column = category_column
                self.diversity_metric.append(metric)
            else:
                self.main_metrics.append(metric)

        self.metrics = self.main_metrics

    def _query_column(self) -> str:
        if self.main_metrics:
            return self.main_metrics[0].query_column
        if self.unexpectedness_metric:
            return self.unexpectedness_metric[0].query_column
        return self.diversity_metric[0].query_column

    @staticmethod
    def _unique_queries(dataset: MetricsDataFrameLike, query_column: str) -> set:
        if isinstance(dataset, pd.DataFrame):
            return set(dataset[query_column].unique())
        return set(dataset.keys())

    @staticmethod
    def _check_contains(queries: set, other_queries: set, dataset_name: str) -> None:
        if not queries.issubset(other_queries):
            warnings.warn(
                f"{dataset_name} contains queries that are not presented in recommendations"
            )

    def __call__(
        self,
        recommendations: MetricsDataFrameLike,
        ground_truth: MetricsDataFrameLike,
        train: Optional[MetricsDataFrameLike] = None,
        base_recommendations: Optional[
            Union[MetricsDataFrameLike, Dict[str, MetricsDataFrameLike]]
        ] = None,
    ) -> Dict[str, float]:
        """Compute all configured metrics; see Metric.__call__ for input formats."""
        query_column = self._query_column()
        recs_queries = self._unique_queries(recommendations, query_column)
        self._check_contains(
            recs_queries, self._unique_queries(ground_truth, query_column), "ground_truth"
        )
        if train is not None:
            self._check_contains(
                recs_queries, self._unique_queries(train, query_column), "train"
            )

        result: Dict[str, float] = {}
        current_map = {"ground_truth": ground_truth, "train": train}
        # one shared RankingPrep across all ranking metrics (pandas inputs):
        # the hits matrix is built once at the max cutoff and reused
        shared_prep = None
        batchable = [
            m
            for m in self.metrics
            if hasattr(m, "_get_metric_values_batch")
            and self._metrics_call_requirement_map[m.__class__.__name__]
            == ["ground_truth"]
        ]
        if (
            self._allow_caching
            and batchable
            and isinstance(recommendations, pd.DataFrame)
            and isinstance(ground_truth, pd.DataFrame)
            and len(ground_truth)
        ):
            from replay_tpu.metrics.base_metric import RankingPrep

            first = batchable[0]
            shared_prep = RankingPrep(
                recommendations,
                ground_truth,
                first.query_column,
                first.item_column,
                first.rating_column,
                max(max(m.topk) for m in batchable),
            )
        for metric in self.metrics:
            requirement = self._metrics_call_requirement_map[metric.__class__.__name__]
            args = [current_map[name] for name in requirement]
            if any(arg is None for arg in args):
                msg = (
                    f"{metric.__class__.__name__} requires {requirement}, "
                    "but it was not provided"
                )
                raise ValueError(msg)
            if shared_prep is not None and metric in batchable:
                result.update(metric._call_with_prep(shared_prep))
            else:
                result.update(metric(recommendations, *args))

        if self.unexpectedness_metric:
            if base_recommendations is None:
                msg = "Can not calculate Unexpectedness because base_recommendations is None"
                raise ValueError(msg)
            named = base_recommendations
            if not isinstance(named, dict) or (
                named and isinstance(next(iter(named.values())), list)
            ):
                for unexp in self.unexpectedness_metric:
                    result.update(unexp(recommendations, base_recommendations))
            else:
                for unexp in self.unexpectedness_metric:
                    for model_name, base_recs in named.items():
                        cur = unexp(recommendations, base_recs)
                        for metric_name, value in cur.items():
                            prefix, _, k = metric_name.partition("@")
                            result[f"{prefix}_{model_name}@{k}"] = value

        for diversity in self.diversity_metric:
            result.update(diversity(recommendations))

        return result
