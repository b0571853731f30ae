"""Ranking metrics: Precision, Recall, MAP, MRR, NDCG, HitRate, RocAuc.

Per-user kernels match the reference formulas exactly (reference:
replay/metrics/{precision,recall,map,mrr,ndcg,hitrate,rocauc}.py), expressed
over a numpy hit vector rather than python set loops.
"""

import math
from typing import List

import numpy as np

from replay_tpu.metrics.base_metric import Metric


def _hits(pred: list, set_gt: set, upto: int) -> np.ndarray:
    return np.fromiter((p in set_gt for p in pred[:upto]), dtype=bool, count=min(upto, len(pred)))


class Precision(Metric):
    """Fraction of top-k recommendations present in ground truth."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not ground_truth or not pred:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        hits = _hits(pred, set_gt, max(ks))
        csum = np.cumsum(hits)
        out = []
        for k in ks:
            n = min(k, len(hits))
            out.append(float(csum[n - 1]) / k if n else 0.0)
        return out


class Recall(Metric):
    """Fraction of ground-truth items recovered in top-k."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not ground_truth or not pred:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        hits = _hits(pred, set_gt, max(ks))
        csum = np.cumsum(hits)
        out = []
        for k in ks:
            n = min(k, len(hits))
            out.append(float(csum[n - 1]) / len(set_gt) if n else 0.0)
        return out


class MAP(Metric):
    """Mean average precision at k."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not ground_truth or not pred:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        hits = _hits(pred, set_gt, max(ks)).astype(np.float64)
        precision_at = np.cumsum(hits) / (np.arange(len(hits)) + 1.0)
        ap_terms = np.cumsum(precision_at * hits)
        out = []
        for k in ks:
            length = min(k, len(pred))
            max_good = min(k, len(ground_truth))
            val = float(ap_terms[length - 1]) if length else 0.0
            out.append(val / max_good)
        return out


class MRR(Metric):
    """Reciprocal rank of the first relevant item in top-k."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not ground_truth or not pred:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        first = next((i for i, p in enumerate(pred[: max(ks)]) if p in set_gt), None)
        return [0.0 if first is None or first >= k else 1.0 / (first + 1) for k in ks]


class NDCG(Metric):
    """Normalized discounted cumulative gain with binary relevance."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not pred or not ground_truth:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        hits = _hits(pred, set_gt, max(ks)).astype(np.float64)
        denom = 1.0 / np.log2(np.arange(max(ks)) + 2.0)
        gains = np.zeros(max(ks))
        gains[: len(hits)] = hits * denom[: len(hits)]
        dcg_cum = np.cumsum(gains)
        idcg_cum = np.cumsum(denom)
        out = []
        for k in ks:
            gt_len = min(k, len(ground_truth))
            out.append(float(dcg_cum[k - 1] / idcg_cum[gt_len - 1]))
        return out


class HitRate(Metric):
    """1 if any top-k recommendation is relevant."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not ground_truth or not pred:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        first = next((i for i, p in enumerate(pred[: max(ks)]) if p in set_gt), None)
        return [1.0 if first is not None and first < k else 0.0 for k in ks]


class RocAuc(Metric):
    """Area under the ROC curve over the top-k ranking."""

    @staticmethod
    def _get_metric_value_by_user(ks: List[int], ground_truth: list, pred: list) -> List[float]:
        if not ground_truth or not pred:
            return [0.0 for _ in ks]
        set_gt = set(ground_truth)
        out = []
        for k in ks:
            length = min(k, len(pred))
            fp_cur = 0
            fp_cum = 0
            for item in pred[:length]:
                if item in set_gt:
                    fp_cum += fp_cur
                else:
                    fp_cur += 1
            if fp_cur == length:
                out.append(0.0)
            elif fp_cum == 0:
                out.append(1.0)
            else:
                out.append(1 - fp_cum / (fp_cur * (length - fp_cur)))
        return out
