"""Ranking metrics: Precision, Recall, MAP, MRR, NDCG, HitRate, RocAuc.

Per-user kernels match the reference formulas exactly (reference:
replay/metrics/{precision,recall,map,mrr,ndcg,hitrate,rocauc}.py), expressed
over a numpy hit vector rather than python set loops.  Pandas inputs take
the vectorized batch path: every metric is a [n_users, max_k] numpy
expression over the shared RankingPrep hits matrix (replacing the
reference's per-user Scala UDFs, scala/.../ScalaPySparkUDFs.scala:9-160);
dict inputs keep the per-user kernels.
"""

import math
from typing import List

import numpy as np

from replay_tpu.metrics.base_metric import Metric, RankingPrep


def _hits(pred: list, set_gt: set, upto: int) -> np.ndarray:
    return np.fromiter((p in set_gt for p in pred[:upto]), dtype=bool, count=min(upto, len(pred)))


class Precision(Metric):
    """Fraction of top-k recommendations present in ground truth."""

    @staticmethod
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            out[:, col] = np.where(prep.nonzero, prep.csum[:, k - 1] / k, 0.0)
        return out

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
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        denom = np.maximum(prep.gt_set_len, 1)
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            out[:, col] = np.where(prep.nonzero, prep.csum[:, k - 1] / denom, 0.0)
        return out

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
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        precision_at = prep.csum / (np.arange(prep.max_k) + 1.0)[None, :]
        ap_terms = np.cumsum(precision_at * prep.hits_f, axis=1)
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            max_good = np.maximum(np.minimum(k, prep.gt_raw_len), 1)
            out[:, col] = np.where(prep.nonzero, ap_terms[:, k - 1] / max_good, 0.0)
        return out

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
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        has = prep.hits.any(axis=1)
        first = np.argmax(prep.hits, axis=1)
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            good = prep.nonzero & has & (first < k)
            out[:, col] = np.where(good, 1.0 / (first + 1.0), 0.0)
        return out

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
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        denom = 1.0 / np.log2(np.arange(prep.max_k) + 2.0)
        dcg_cum = np.cumsum(prep.hits_f * denom[None, :], axis=1)
        idcg_cum = np.cumsum(denom)
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            gt_len = np.maximum(np.minimum(k, prep.gt_raw_len), 1)
            out[:, col] = np.where(
                prep.nonzero, dcg_cum[:, k - 1] / idcg_cum[gt_len - 1], 0.0
            )
        return out

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
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            out[:, col] = np.where(prep.nonzero & (prep.csum[:, k - 1] > 0), 1.0, 0.0)
        return out

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
    def _get_metric_values_batch(ks: List[int], prep: RankingPrep) -> np.ndarray:
        cols = np.arange(prep.max_k)
        valid = cols[None, :] < prep.pred_len[:, None]
        nh = valid & ~prep.hits
        nh_cum = np.cumsum(nh, axis=1)
        nh_excl = nh_cum - nh
        fp_cum_arr = np.cumsum(prep.hits_f * nh_excl, axis=1)
        out = np.zeros((len(prep.users), len(ks)))
        for col, k in enumerate(ks):
            length = np.minimum(k, prep.pred_len)
            fp_cur = nh_cum[:, k - 1]
            fp_cum = fp_cum_arr[:, k - 1]
            with np.errstate(divide="ignore", invalid="ignore"):
                val = 1.0 - fp_cum / (fp_cur * (length - fp_cur))
            val = np.where(fp_cum == 0, 1.0, val)
            val = np.where(fp_cur == length, 0.0, val)
            out[:, col] = np.where(prep.nonzero, val, 0.0)
        return out

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
