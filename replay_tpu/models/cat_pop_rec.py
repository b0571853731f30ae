"""CatPopRec: popularity recommendations per item category.

TPU-native analog of the reference (reference: replay/models/cat_pop_rec.py:23).
Pure host-side aggregation — per-category popularity tables are tiny
(no device kernels warranted).  Supports flat categories and hierarchical
category trees: a ``cat_tree`` frame with (category, parent_cat) columns is
flattened into a category → leaf-category mapping by iterative descent
(the reference's `_generate_mapping`), and a category's recommendation pool
is the union of its leaf categories' items, popularity normalized by total
interactions within the category.
"""

from typing import Iterable, Optional, Union

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import IsSavable, RecommenderCommons


class CatPopRec(IsSavable, RecommenderCommons):
    """Most-popular-in-category recommender (flat or tree categories)."""

    can_predict_cold_items: bool = False
    category_column: str = "category"

    def __init__(self, cat_tree: Optional[pd.DataFrame] = None, max_iter: int = 20):
        self.max_iter = max_iter
        self.cat_item_popularity: Optional[pd.DataFrame] = None
        self.leaf_cat_mapping: Optional[pd.DataFrame] = None
        self.fit_items: Optional[np.ndarray] = None
        if cat_tree is not None:
            self.leaf_cat_mapping = self._generate_mapping(cat_tree, max_iter)

    @property
    def _init_args(self):
        return {"max_iter": self.max_iter}

    @property
    def _dataframes(self):
        return {
            "cat_item_popularity": self.cat_item_popularity,
            "leaf_cat_mapping": self.leaf_cat_mapping,
        }

    # ------------------------------------------------------------- tree
    def _generate_mapping(self, cat_tree: pd.DataFrame, max_iter: int = 20) -> pd.DataFrame:
        """(category, parent_cat) edges → (category, leaf_cat) closure."""
        current = pd.DataFrame(
            {"category": cat_tree["category"], "leaf_cat": cat_tree["category"]}
        )
        for i in range(max_iter):
            joined = current.merge(
                cat_tree.rename(columns={"category": "new_leaf_cat", "parent_cat": "leaf_join"}),
                left_on="leaf_cat",
                right_on="leaf_join",
                how="left",
            )
            joined["leaf_cat"] = joined["new_leaf_cat"].combine_first(joined["leaf_cat"])
            new = joined[["category", "leaf_cat"]].drop_duplicates()
            if len(new) == len(current):
                return new.reset_index(drop=True)
            current = new
        self.logger.warning(
            "Category tree was not fully processed in %s iterations.", max_iter
        )
        return current.reset_index(drop=True)

    def set_cat_tree(self, cat_tree: pd.DataFrame) -> None:
        self.leaf_cat_mapping = self._generate_mapping(cat_tree, self.max_iter)

    # ------------------------------------------------------------- fit
    def fit(self, dataset: Dataset) -> None:
        """Interactions must contain a ``category`` column (item's category)."""
        self.query_column = dataset.feature_schema.query_id_column
        self.item_column = dataset.feature_schema.item_id_column
        self.rating_column = dataset.feature_schema.interactions_rating_column or "rating"
        inter = dataset.interactions
        self.fit_items = np.unique(inter[self.item_column].to_numpy())
        if self.rating_column in inter.columns:
            pop = (
                inter.groupby([self.category_column, self.item_column])[self.rating_column]
                .sum()
                .reset_index()
            )
        else:
            pop = (
                inter.groupby([self.category_column, self.item_column])
                .size()
                .rename(self.rating_column)
                .reset_index()
            )
        self.cat_item_popularity = pop

    # ------------------------------------------------------------- predict
    def predict(
        self,
        categories: Union[pd.DataFrame, Iterable],
        k: int,
        items: Union[pd.DataFrame, Iterable, None] = None,
    ) -> pd.DataFrame:
        """Top-k items per category."""
        if isinstance(categories, pd.DataFrame):
            cats = categories[self.category_column].unique()
        else:
            cats = np.unique(np.asarray(list(categories)))
        if items is None:
            item_pool = self.fit_items
        else:
            if isinstance(items, pd.DataFrame):
                items = items[self.item_column].to_numpy()
            item_pool = np.asarray(list(items))
            cold = ~np.isin(item_pool, self.fit_items)
            if cold.any():
                self.logger.info(
                    "%s model can't predict cold items, they will be ignored", self
                )
            item_pool = item_pool[~cold]

        mapping = self.leaf_cat_mapping
        if mapping is None:  # flat categories: each maps to itself
            mapping = pd.DataFrame({"category": cats, "leaf_cat": cats})
        mapping = mapping[mapping["category"].isin(cats)]

        pool = self.cat_item_popularity[
            self.cat_item_popularity[self.item_column].isin(item_pool)
        ].rename(columns={self.category_column: "leaf_cat"})
        merged = mapping.merge(pool, on="leaf_cat")
        agg = (
            merged.groupby(["category", self.item_column])[self.rating_column]
            .sum()
            .reset_index()
        )
        totals = agg.groupby("category")[self.rating_column].transform("sum")
        agg[self.rating_column] = agg[self.rating_column] / totals
        recs = (
            agg.sort_values(
                ["category", self.rating_column, self.item_column],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby("category", sort=False)
            .head(k)
        )
        return recs.rename(columns={"category": self.category_column}).reset_index(drop=True)
