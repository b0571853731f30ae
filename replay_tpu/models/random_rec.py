"""Random recommender (reference: replay/models/random_rec.py:10)."""

from typing import Optional

import numpy as np

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import NonPersonalizedRecommender

_search_space = {
    "distribution": {"type": "categorical", "args": ["popular_based", "relevance", "uniform"]},
    "alpha": {"type": "uniform", "args": [-0.5, 100]},
}


class RandomRec(NonPersonalizedRecommender):
    """Sample items at random: uniformly, by popularity P(i) ∝ N_i + alpha,
    or by total relevance.  Always predicts by sampling (Gumbel-top-k on
    device)."""

    sample = True
    _search_space = _search_space

    def __init__(
        self,
        distribution: str = "uniform",
        alpha: float = 0.0,
        seed: Optional[int] = None,
        add_cold_items: bool = True,
        cold_weight: float = 0.5,
    ):
        if distribution not in ("popular_based", "relevance", "uniform"):
            msg = "distribution can be one of [popular_based, relevance, uniform]"
            raise ValueError(msg)
        if alpha <= -1.0 and distribution == "popular_based":
            msg = "alpha must be bigger than -1"
            raise ValueError(msg)
        self.distribution = distribution
        self.alpha = alpha
        self.seed = seed
        super().__init__(add_cold_items=add_cold_items, cold_weight=cold_weight)

    @property
    def _init_args(self):
        return {
            "distribution": self.distribution,
            "alpha": self.alpha,
            "seed": self.seed,
            "add_cold_items": self.add_cold_items,
            "cold_weight": self.cold_weight,
        }

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        if self.distribution == "popular_based":
            pop = inter.groupby(self.item_column)[self.query_column].nunique().astype(
                np.float64
            ) + self.alpha
        elif self.distribution == "relevance":
            pop = inter.groupby(self.item_column)[self.rating_column].sum().astype(np.float64)
        else:
            items = np.unique(inter[self.item_column].to_numpy())
            import pandas as pd

            pop = pd.Series(1.0, index=pd.Index(items, name=self.item_column))
        pop = pop / pop.sum()
        self.item_popularity = pop.rename(self.rating_column).reset_index()
        self.fill = self._calc_fill(self.item_popularity, self.cold_weight, self.rating_column)
