"""NCIS-weighted precision (Normalized Capped Importance Sampling).

TPU-native analog of the reference (reference:
replay/experimental/metrics/ncis_precision.py:6 NCISPrecision +
base_metric.py:441 NCISMetric; Gilotte et al., arXiv 1801.07030): each
recommended item's reward is weighted by the capped ratio of the current
policy score to the logging (previous) policy score, optionally after a
softmax/sigmoid activation over each user's scores:

    w_ui = clip(f(pi_t) / f(pi_p), 1/threshold, threshold)
    Precision@K(u) = sum_hits(w) / sum_topk(w)
"""

from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from replay_tpu.metrics.base_metric import Metric, MetricsReturnType


def _activate(scores: np.ndarray, activation: Optional[str]) -> np.ndarray:
    if activation is None:
        return scores
    if activation == "softmax":
        e = np.exp(scores - scores.max())
        return e / e.sum()
    if activation == "sigmoid":
        return 1.0 / (1.0 + np.exp(-scores))
    msg = f"Unknown activation {activation}"
    raise ValueError(msg)


class NCISMetric(Metric):
    """Base for NCIS-weighted metrics (reference: base_metric.py:441
    NCISMetric): holds the logging-policy weights, the activation, the
    capped importance ratio, and the per-user evaluation loop.  Subclasses
    implement :meth:`_metric_at_k` over (weights, hits) arrays."""

    def __init__(
        self,
        topk: Union[List[int], int],
        prev_policy_weights: pd.DataFrame,
        threshold: float = 10.0,
        activation: Optional[str] = None,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
    ) -> None:
        super().__init__(
            topk,
            query_column=query_column,
            item_column=item_column,
            rating_column=rating_column,
        )
        self.threshold = threshold
        self.activation = activation
        self._prev: Dict[Tuple, float] = {
            (q, i): float(r)
            for q, i, r in prev_policy_weights[
                [query_column, item_column, rating_column]
            ].to_numpy()
        }

    @staticmethod
    def _get_metric_value_by_user(ks, *args):  # pragma: no cover - bypassed
        """Unused: NCIS needs per-user weights, so __call__ is overridden."""
        raise NotImplementedError

    @staticmethod
    def _metric_at_k(top_w: np.ndarray, top_hits: np.ndarray) -> float:
        """Weighted metric value for one user's top-k slice."""
        raise NotImplementedError

    def _weights_for_user(self, query, items: List, scores: List[float]) -> np.ndarray:
        cur = _activate(np.asarray(scores, dtype=np.float64), self.activation)
        prev_raw = np.asarray(
            [self._prev.get((query, item), 1.0) for item in items], dtype=np.float64
        )
        prev = _activate(prev_raw, self.activation)
        w = np.divide(cur, prev, out=np.ones_like(cur), where=prev != 0)
        return np.clip(w, 1.0 / self.threshold, self.threshold)

    def __call__(self, recommendations, ground_truth) -> MetricsReturnType:
        is_pandas = isinstance(recommendations, pd.DataFrame)
        if is_pandas:
            sorted_recs = recommendations.sort_values(
                [self.rating_column, self.item_column], ascending=False, kind="stable"
            )
            rec_items = (
                sorted_recs.groupby(self.query_column)[self.item_column].apply(list).to_dict()
            )
            rec_scores = (
                sorted_recs.groupby(self.query_column)[self.rating_column].apply(list).to_dict()
            )
            gt = ground_truth.groupby(self.query_column)[self.item_column].apply(set).to_dict()
        else:
            rec_items = {q: [i for i, _ in lst] for q, lst in recommendations.items()}
            rec_scores = {q: [s for _, s in lst] for q, lst in recommendations.items()}
            gt = {q: set(items) for q, items in ground_truth.items()}

        distributions = {k: [] for k in self.topk}
        for query in gt:
            items = rec_items.get(query, [])
            scores = rec_scores.get(query, [])
            truth = gt[query]
            if not items:
                for k in self.topk:
                    distributions[k].append(0.0)
                continue
            weights = self._weights_for_user(query, items, scores)
            hits = np.isin(np.asarray(items), list(truth))
            for k in self.topk:
                distributions[k].append(self._metric_at_k(weights[:k], hits[:k]))
        result = {}
        for k in self.topk:
            result[f"{type(self).__name__}@{k}"] = self._mode.cpu(
                np.asarray(distributions[k])
            )
        return result


class NCISPrecision(NCISMetric):
    """Precision@K with NCIS weighting (reference:
    replay/experimental/metrics/ncis_precision.py:6): weighted hit mass over
    total weight mass of the top-k slice."""

    @staticmethod
    def _metric_at_k(top_w: np.ndarray, top_hits: np.ndarray) -> float:
        denom = top_w.sum()
        return float((top_w * top_hits).sum() / denom) if denom > 0 else 0.0
