"""UCB bandit recommender (reference: replay/models/ucb.py:14)."""

import math
from typing import Optional

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import NonPersonalizedRecommender


class UCB(NonPersonalizedRecommender):
    """Upper confidence bound bandit: pred_i = ctr_i + sqrt(c * ln(n) / n_i).

    Ratings must be binary 0/1.  Supports iterative ``refit``.
    """

    full_count: int
    items_counts_aggr: pd.DataFrame

    def __init__(
        self,
        exploration_coef: float = 2,
        sample: bool = False,
        seed: Optional[int] = None,
    ):
        self.coef = exploration_coef
        self.sample = sample
        self.seed = seed
        super().__init__(add_cold_items=True, cold_weight=1)

    @property
    def _init_args(self):
        return {"exploration_coef": self.coef, "sample": self.sample, "seed": self.seed}

    def optimize(self, *args, **kwargs) -> None:
        """UCB has no directly optimizable parameters."""
        self.logger.warning(
            "The UCB model has only exploration coefficient parameter, "
            "which cannot not be directly optimized"
        )

    def _aggregate(self, dataset: Dataset) -> pd.DataFrame:
        grouped = dataset.interactions.groupby(self.item_column)[self.rating_column].agg(
            pos="sum", total="count"
        )
        return grouped.reset_index()

    def _fit(self, dataset: Dataset) -> None:
        self._check_rating(dataset)
        self.items_counts_aggr = self._aggregate(dataset)
        self.full_count = len(dataset.interactions)
        self._calc_item_popularity()

    def refit(self, dataset: Dataset) -> None:
        """Accumulate a new batch of interactions and refresh the bounds."""
        self._check_rating(dataset)
        new_aggr = self._aggregate(dataset)
        combined = pd.concat([self.items_counts_aggr, new_aggr])
        self.items_counts_aggr = (
            combined.groupby(self.item_column)[["pos", "total"]].sum().reset_index()
        )
        self.full_count += len(dataset.interactions)
        self._calc_item_popularity()

    def _calc_item_popularity(self) -> None:
        pos = self.items_counts_aggr["pos"].to_numpy(dtype=np.float64)
        total = self.items_counts_aggr["total"].to_numpy(dtype=np.float64)
        ucb = pos / total + np.sqrt(self.coef * math.log(self.full_count) / total)
        self.item_popularity = self.items_counts_aggr[[self.item_column]].assign(
            **{self.rating_column: ucb}
        )
        self.fill = 1 + math.sqrt(self.coef * math.log(self.full_count))

    def _get_save_state(self):
        return {
            "fill": self.fill,
            "full_count": self.full_count,
            "items_counts_aggr": self.items_counts_aggr,
        }
