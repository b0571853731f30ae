"""Device-resident batch-accumulating metrics.

TPU-native analog of the reference's TorchMetricsBuilder (reference:
replay/metrics/torch_metrics_builder.py:196, _CoverageHelper :95): ranking
metrics are computed per validation batch ON DEVICE from top-k predicted
item ids vs padded ground-truth sets, and accumulated as running sums, so
validation never materializes a recommendations dataframe.

All update math is one jitted function of static shapes: hits [B, K, G]
from broadcast equality, then every metric is a weighted reduction of the
hit matrix — identical math to the offline dataframe metrics
(replay_tpu/metrics/ranking.py), asserted equal in tests.
"""

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_SUPPORTED = ("map", "ndcg", "recall", "precision", "hitrate", "mrr", "novelty")


@partial(jax.jit, static_argnames=("ks",))
def _batch_metric_sums(
    preds: jnp.ndarray,  # [B, K] int item ids
    ground_truth: jnp.ndarray,  # [B, G] int, -1 padded
    train: jnp.ndarray,  # [B, T] int, -1 padded (seen items, for novelty)
    row_mask: jnp.ndarray,  # [B] {0,1}
    ks: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    gt_valid = ground_truth >= 0  # [B, G]
    gt_count = jnp.sum(gt_valid, axis=1)  # [B]
    hits = (preds[:, :, None] == ground_truth[:, None, :]) & gt_valid[:, None, :]
    hit_at = jnp.any(hits, axis=2).astype(jnp.float32)  # [B, K]

    seen = (preds[:, :, None] == train[:, None, :]) & (train >= 0)[:, None, :]
    is_unseen = 1.0 - jnp.any(seen, axis=2).astype(jnp.float32)  # [B, K] novelty

    out: Dict[str, jnp.ndarray] = {}
    row_mask_f = row_mask.astype(jnp.float32)
    valid_rows = row_mask_f * (gt_count > 0)
    out["_count"] = jnp.sum(valid_rows)
    for k in ks:
        h = hit_at[:, :k]
        positions = jnp.arange(1, k + 1, dtype=jnp.float32)
        gt_k = jnp.minimum(gt_count, k).astype(jnp.float32)
        safe_gt = jnp.maximum(gt_k, 1.0)

        precision = jnp.sum(h, axis=1) / k
        recall = jnp.sum(h, axis=1) / jnp.maximum(gt_count.astype(jnp.float32), 1.0)
        hitrate = jnp.max(h, axis=1)
        # MRR: reciprocal rank of first hit
        first = jnp.argmax(h, axis=1)
        has_hit = jnp.max(h, axis=1) > 0
        mrr = jnp.where(has_hit, 1.0 / (first + 1.0), 0.0)
        # MAP@k (reference normalizes by min(k, |gt|))
        cum_hits = jnp.cumsum(h, axis=1)
        ap = jnp.sum(h * cum_hits / positions[None, :], axis=1) / safe_gt
        # NDCG@k
        discounts = 1.0 / jnp.log2(positions + 1.0)
        dcg = jnp.sum(h * discounts[None, :], axis=1)
        ideal_mask = positions[None, :] <= gt_k[:, None]
        idcg = jnp.sum(discounts[None, :] * ideal_mask, axis=1)
        ndcg = dcg / jnp.maximum(idcg, 1e-9)
        novelty = jnp.sum(is_unseen[:, :k], axis=1) / k

        for name, vals in (
            ("precision", precision),
            ("recall", recall),
            ("hitrate", hitrate),
            ("mrr", mrr),
            ("map", ap),
            ("ndcg", ndcg),
            ("novelty", novelty),
        ):
            out[f"{name}@{k}"] = jnp.sum(vals * valid_rows)
    return out


def metrics_to_df(metrics):
    """{"metric@k": value} → tidy frame with metrics as rows, k as columns
    (reference: replay/metrics/torch_metrics_builder.py:395)."""
    import pandas as pd

    rows = {}
    for name, value in metrics.items():
        metric, _, k = name.partition("@")
        rows.setdefault(metric, {})[f"@{k}" if k else ""] = value
    return pd.DataFrame(rows).T.sort_index()


class MetricsBuilder:
    """Accumulate ranking metrics over prediction batches (reference:
    replay/metrics/torch_metrics_builder.py:196)."""

    def __init__(
        self,
        metrics: Sequence[str] = ("map", "ndcg", "recall"),
        ks: Sequence[int] = (1, 5, 10),
        item_count: Optional[int] = None,
    ):
        unknown = set(m.lower() for m in metrics) - set(_SUPPORTED) - {"coverage"}
        if unknown:
            msg = f"Unsupported metrics: {sorted(unknown)}"
            raise ValueError(msg)
        self.metrics = [m.lower() for m in metrics]
        self.ks = tuple(sorted(ks))
        self.item_count = item_count
        self.reset()

    @property
    def max_k(self) -> int:
        return max(self.ks)

    def reset(self) -> None:
        self._sums: Dict[str, float] = {}
        self._count = 0.0
        self._rec_items: List[np.ndarray] = []
        self._train_items: List[np.ndarray] = []

    def add_prediction(
        self,
        preds,
        ground_truth,
        train=None,
        row_mask=None,
    ) -> None:
        """Accumulate one batch.

        :param preds: [B, K≥max_k] ranked predicted item ids.
        :param ground_truth: [B, G] target ids, -1 padding.
        :param train: [B, T] seen ids (-1 padding), for novelty; optional.
        :param row_mask: [B] {0,1} real-row mask for padded final batches.
        """
        preds = jnp.asarray(preds)[:, : self.max_k]
        ground_truth = jnp.asarray(ground_truth)
        if train is None:
            train = jnp.full((preds.shape[0], 1), -1, dtype=jnp.int32)
        train = jnp.asarray(train)
        if row_mask is None:
            row_mask = jnp.ones(preds.shape[0], dtype=jnp.int8)
        row_mask = jnp.asarray(row_mask)
        sums = _batch_metric_sums(preds, ground_truth, train, row_mask, self.ks)
        sums = jax.device_get(sums)
        self._count += float(sums.pop("_count"))
        for name, val in sums.items():
            self._sums[name] = self._sums.get(name, 0.0) + float(val)
        if "coverage" in self.metrics:
            np_preds = np.asarray(preds)
            np_mask = np.asarray(row_mask).astype(bool)
            self._rec_items.append(np_preds[np_mask])
            np_train = np.asarray(train)[np_mask].ravel()
            # drop padding on BOTH sides like the reference _CoverageHelper
            # (torch_metrics_builder.py:143): ids < 0 AND ids >= item_count
            # (this repo pads sequences with padding id = cardinality)
            valid = np_train >= 0
            if self.item_count:
                valid &= np_train < self.item_count
            self._train_items.append(np.unique(np_train[valid]))

    def get_metrics(self) -> Dict[str, float]:
        """Final metric values (means over accumulated users)."""
        result: Dict[str, float] = {}
        denom = max(self._count, 1.0)
        for metric in self.metrics:
            if metric == "coverage":
                continue
            for k in self.ks:
                result[f"{metric}@{k}"] = self._sums.get(f"{metric}@{k}", 0.0) / denom
        if "coverage" in self.metrics:
            # reference definition (torch_metrics_builder.py:147-156 and the
            # offline Coverage metric): |recommended ∩ train items| / |train
            # items| at each k.  Falls back to the full catalog (item_count)
            # as the denominator when no train batches were supplied.
            if self._train_items:
                train_items = np.unique(np.concatenate(self._train_items))
            else:
                train_items = None
            for k in self.ks:
                if not self._rec_items:
                    result[f"coverage@{k}"] = 0.0
                    continue
                items = np.unique(
                    np.concatenate([p[:, :k].ravel() for p in self._rec_items])
                )
                if train_items is not None and len(train_items):
                    inter = np.intersect1d(items, train_items, assume_unique=True)
                    result[f"coverage@{k}"] = len(inter) / len(train_items)
                elif self.item_count:
                    result[f"coverage@{k}"] = len(items) / self.item_count
                else:
                    result[f"coverage@{k}"] = 0.0
        return result
