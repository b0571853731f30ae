"""Thompson sampling recommender (reference: replay/models/thompson_sampling.py:12)."""

from typing import Optional

import numpy as np

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import NonPersonalizedRecommender


class ThompsonSampling(NonPersonalizedRecommender):
    """Bernoulli bandit with Beta(1,1) prior: item rating is a Beta sample
    from its positive/negative interaction counts."""

    def __init__(self, sample: bool = False, seed: Optional[int] = None):
        self.sample = sample
        self.seed = seed
        super().__init__(add_cold_items=True, cold_weight=1)

    @property
    def _init_args(self):
        return {"sample": self.sample, "seed": self.seed}

    def _fit(self, dataset: Dataset) -> None:
        self._check_rating(dataset)
        inter = dataset.interactions
        rating = inter[self.rating_column]
        pos = (
            inter[rating == 1].groupby(self.item_column)[self.rating_column].count()
        )
        neg = (
            inter[rating == 0].groupby(self.item_column)[self.rating_column].count()
        )
        both = pos.index.intersection(neg.index)
        rng = np.random.RandomState(self.seed)
        samples = rng.beta(pos.loc[both].to_numpy(), neg.loc[both].to_numpy())
        self.item_popularity = (
            both.to_frame(index=False)
            .rename(columns={0: self.item_column})
            .assign(**{self.rating_column: samples})
        )
        self.item_popularity.columns = [self.item_column, self.rating_column]
        self.fill = float(rng.beta(1, 1))
