"""Model-comparison results table (reference: replay/metrics/experiment.py:7)."""

from typing import Dict, List, Optional, Union

import pandas as pd

from replay_tpu.metrics.base_metric import Metric, MetricsDataFrameLike
from replay_tpu.metrics.offline_metrics import OfflineMetrics


class Experiment:
    """Compute, store, and compare metrics for several models.

    >>> import pandas as pd
    >>> from replay_tpu.metrics import HitRate, NDCG
    >>> gt = pd.DataFrame({"query_id": [1, 1, 2], "item_id": [10, 11, 12]})
    >>> recs = pd.DataFrame(
    ...     {"query_id": [1, 1, 2, 2], "item_id": [10, 99, 12, 13],
    ...      "rating": [0.9, 0.8, 0.7, 0.6]})
    >>> ex = Experiment([HitRate(2), NDCG(2)], gt)
    >>> ex.add_result("my_model", recs)
    >>> ex.results.round(4)
              HitRate@2  NDCG@2
    my_model        1.0  0.8066
    """

    def __init__(
        self,
        metrics: List[Metric],
        ground_truth: MetricsDataFrameLike,
        train: Optional[MetricsDataFrameLike] = None,
        base_recommendations: Optional[
            Union[MetricsDataFrameLike, Dict[str, MetricsDataFrameLike]]
        ] = None,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        category_column: str = "category_id",
    ):
        self._offline_metrics = OfflineMetrics(
            metrics=metrics,
            query_column=query_column,
            item_column=item_column,
            rating_column=rating_column,
            category_column=category_column,
        )
        self._ground_truth = ground_truth
        self._train = train
        self._base_recommendations = base_recommendations
        self.results = pd.DataFrame()

    def add_result(self, name: str, recommendations: MetricsDataFrameLike) -> None:
        """Evaluate ``recommendations`` and store a row under ``name``."""
        cur_metrics = self._offline_metrics(
            recommendations, self._ground_truth, self._train, self._base_recommendations
        )
        for metric, value in cur_metrics.items():
            self.results.at[name, metric] = value

    def compare(self, name: str) -> pd.DataFrame:
        """Percentage difference of every run relative to run ``name``."""
        if name not in self.results.index:
            msg = f"No results for model {name}"
            raise ValueError(msg)
        columns = [c for c in self.results.columns if c[-1].isdigit()]
        frame = self.results[columns].copy().astype(object)
        baseline = self.results.loc[name, columns]
        for idx in frame.index:
            if idx != name:
                diff = self.results.loc[idx, columns] / baseline - 1
                frame.loc[idx] = [f"{round(v * 100, 2)}%" for v in diff]
            else:
                frame.loc[name] = ["–"] * len(columns)
        return frame
