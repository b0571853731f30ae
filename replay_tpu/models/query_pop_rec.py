"""Per-query popularity recommender (reference: replay/models/query_pop_rec.py:10)."""

from typing import Optional

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender


class QueryPopRec(Recommender):
    """Recommend each query its own most-interacted items:
    Popularity(i|u) = rating_sum(u, i) / rating_sum(u)."""

    query_item_popularity: pd.DataFrame

    @property
    def _init_args(self):
        return {}

    @property
    def _dataframes(self):
        return {"query_item_popularity": self.query_item_popularity}

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        pair_sum = (
            inter.groupby([self.query_column, self.item_column])[self.rating_column]
            .sum()
            .rename("pair_sum")
            .reset_index()
        )
        query_sum = inter.groupby(self.query_column)[self.rating_column].sum().rename("query_sum")
        merged = pair_sum.merge(query_sum, on=self.query_column)
        merged[self.rating_column] = merged["pair_sum"] / merged["query_sum"]
        self.query_item_popularity = merged[
            [self.query_column, self.item_column, self.rating_column]
        ]

    def _predict_pairs(
        self,
        pairs: pd.DataFrame,
        dataset: Optional[Dataset] = None,
    ) -> pd.DataFrame:
        """Join requested pairs with the per-query popularity table; pairs
        outside a query's history are dropped (reference join-fallback
        semantics, replay/models/base_rec.py:569-585)."""
        return pairs.merge(
            self.query_item_popularity,
            on=[self.query_column, self.item_column],
            how="inner",
        )

    def _predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: np.ndarray,
        items: np.ndarray,
        filter_seen_items: bool = True,
    ) -> pd.DataFrame:
        if filter_seen_items:
            self.logger.warning(
                "QueryPopRec can't predict new items, recommendations will not be filtered"
            )
        pop = self.query_item_popularity
        recs = pop[
            pop[self.query_column].isin(queries) & pop[self.item_column].isin(items)
        ].copy()
        return (
            recs.sort_values(
                [self.query_column, self.rating_column, self.item_column],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby(self.query_column, sort=False)
            .head(k)
        )
