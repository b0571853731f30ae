"""Wilson lower-bound recommender (reference: replay/models/wilson.py:12)."""

from typing import Optional

import numpy as np
from scipy.stats import norm

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.pop_rec import PopRec


class Wilson(PopRec):
    """Rank items by the Wilson lower confidence bound of their positive-rate.

    Ratings must be binary 0/1.
    """

    def __init__(
        self,
        alpha: float = 0.05,
        add_cold_items: bool = True,
        cold_weight: float = 0.5,
        sample: bool = False,
        seed: Optional[int] = None,
    ):
        self.alpha = alpha
        self.sample = sample
        self.seed = seed
        super().__init__(add_cold_items=add_cold_items, cold_weight=cold_weight)

    @property
    def _init_args(self):
        return {
            "alpha": self.alpha,
            "add_cold_items": self.add_cold_items,
            "cold_weight": self.cold_weight,
            "sample": self.sample,
            "seed": self.seed,
        }

    def _fit(self, dataset: Dataset) -> None:
        self._check_rating(dataset)
        grouped = dataset.interactions.groupby(self.item_column)[self.rating_column].agg(
            ["sum", "count"]
        )
        pos = grouped["sum"].to_numpy(dtype=np.float64)
        total = grouped["count"].to_numpy(dtype=np.float64)
        crit = norm.isf(self.alpha / 2.0)
        center = (pos + 0.5 * crit**2) / (total + crit**2)
        margin = (
            crit
            / (total + crit**2)
            * np.sqrt((total - pos) * pos / total + crit**2 / 4)
        )
        self.item_popularity = grouped.reset_index()[[self.item_column]].assign(
            **{self.rating_column: center - margin}
        )
        self.fill = self._calc_fill(self.item_popularity, self.cold_weight, self.rating_column)
