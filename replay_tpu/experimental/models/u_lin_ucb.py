"""ULinUCB: user-disjoint LinUCB.

TPU-native analog of the reference (reference:
replay/experimental/models/u_lin_ucb.py) — the transpose of LinUCB: each
USER is an arm with its own ridge regression over ITEM features; the UCB
exploration bonus uses the user's inverse design matrix.  All users are
fitted with one batched segment-sum + solve (replay_tpu/models/lin_ucb.py
kernels, swapped roles).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import HybridRecommender
from replay_tpu.models.lin_ucb import _fit_disjoint, _score_disjoint


class ULinUCB(HybridRecommender):
    """Per-user linear UCB over item features."""

    def __init__(self, eps: float = 0.0, alpha: float = 1.0):
        self.eps = eps
        self.alpha = alpha
        self.theta: Optional[np.ndarray] = None
        self.a_inv: Optional[np.ndarray] = None
        self._item_feature_cols = None

    @property
    def _init_args(self):
        return {"eps": self.eps, "alpha": self.alpha}

    def _get_save_state(self):
        return {
            "theta": self.theta,
            "a_inv": self.a_inv,
            "_item_feature_cols": self._item_feature_cols,
        }

    def _fit(self, dataset: Dataset) -> None:
        if dataset.item_features is None:
            msg = "Item features are missing"
            raise ValueError(msg)
        inter = dataset.interactions
        itf = dataset.item_features
        self._item_feature_cols = [c for c in itf.columns if c != self.item_column]

        merged = inter.merge(itf, on=self.item_column, how="inner")
        x = merged[self._item_feature_cols].to_numpy(dtype=np.float32)
        r = (
            merged[self.rating_column].to_numpy(dtype=np.float32)
            if self.rating_column in merged.columns
            else np.ones(len(merged), dtype=np.float32)
        )
        user_ids = np.searchsorted(self.fit_queries, merged[self.query_column].to_numpy())
        theta, a_inv = _fit_disjoint(
            jnp.asarray(x),
            jnp.asarray(r),
            jnp.asarray(user_ids),
            jnp.float32(self.alpha),
            len(self.fit_queries),
        )
        self.theta = np.asarray(theta)
        self.a_inv = np.asarray(a_inv)

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None or dataset.item_features is None:
            msg = "ULinUCB requires item features at predict time"
            raise ValueError(msg)
        itf = dataset.item_features
        order = pd.DataFrame({self.item_column: item_ids})
        itf = order.merge(itf, on=self.item_column, how="left").fillna(0.0)
        x = itf[self._item_feature_cols].to_numpy(dtype=np.float32)
        q_pos = np.searchsorted(self.fit_queries, query_ids)
        # scores [n_items, n_users] from the arm=user formulation → transpose
        scores = _score_disjoint(
            jnp.asarray(x),
            jnp.asarray(self.theta[q_pos]),
            jnp.asarray(self.a_inv[q_pos]),
            jnp.float32(self.eps),
        )
        return np.asarray(scores).T
