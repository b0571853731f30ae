"""Popularity recommender (reference: replay/models/pop_rec.py:10)."""

import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import NonPersonalizedRecommender


class PopRec(NonPersonalizedRecommender):
    """Recommend items by popularity.

    Popularity(i) = (#users who interacted with i) / (#users), or the sum of
    ratings divided by #users when ``use_rating=True``.

    >>> import pandas as pd
    >>> from replay_tpu.data import Dataset, FeatureSchema, FeatureInfo, FeatureHint, FeatureType
    >>> df = pd.DataFrame({"user_id": [1, 1, 2, 2, 3, 4],
    ...                    "item_id": [1, 2, 2, 3, 3, 3],
    ...                    "rating": [0.5, 1, 0.1, 0.8, 0.7, 1]})
    >>> schema = FeatureSchema([
    ...     FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
    ...     FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
    ...     FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING)])
    >>> dataset = Dataset(schema, df)
    >>> res = PopRec().fit_predict(dataset, 1)
    >>> res.sort_values("user_id", ignore_index=True)
       user_id  item_id  rating
    0        1        3    0.75
    1        2        1    0.25
    2        3        2    0.50
    3        4        2    0.50
    """

    sample: bool = False

    def __init__(
        self,
        use_rating: bool = False,
        add_cold_items: bool = True,
        cold_weight: float = 0.5,
    ):
        self.use_rating = use_rating
        super().__init__(add_cold_items=add_cold_items, cold_weight=cold_weight)

    @property
    def _init_args(self):
        return {
            "use_rating": self.use_rating,
            "add_cold_items": self.add_cold_items,
            "cold_weight": self.cold_weight,
        }

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        if self.use_rating:
            pop = inter.groupby(self.item_column)[self.rating_column].sum()
        else:
            pop = inter.groupby(self.item_column)[self.query_column].nunique()
        pop = (pop / self.queries_count).rename(self.rating_column)
        self.item_popularity = pop.reset_index()
        self.fill = self._calc_fill(self.item_popularity, self.cold_weight, self.rating_column)
