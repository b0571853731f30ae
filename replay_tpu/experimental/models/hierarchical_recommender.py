"""Hierarchical recommender: cluster tree of per-node models.

TPU-native analog of the reference (reference:
replay/experimental/models/hierarchical_recommender.py:13 + Node :129).
Users are recursively k-means-clustered on their features into a tree;
each leaf trains its own recommender on its cluster's interactions, and
prediction routes every query down the tree to its leaf's model.
"""

from typing import Callable, Optional

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import HybridRecommender
from replay_tpu.models.cluster import _assign, _kmeans

import jax.numpy as jnp


class _Node:
    def __init__(self, depth: int):
        self.depth = depth
        self.centers: Optional[np.ndarray] = None
        self.children: list = []
        self.model = None


class HierarchicalRecommender(HybridRecommender):
    """Tree of k-means user clusters with a recommender per leaf."""

    def __init__(
        self,
        model_factory: Optional[Callable] = None,
        branching: int = 2,
        depth: int = 2,
        min_cluster_size: int = 10,
        seed: int = 0,
    ):
        from replay_tpu.models.pop_rec import PopRec

        self.model_factory = model_factory or PopRec
        self.branching = branching
        self.depth = depth
        self.min_cluster_size = min_cluster_size
        self.seed = seed
        self._root: Optional[_Node] = None
        self._feature_cols = None

    @property
    def _init_args(self):
        return {
            "branching": self.branching,
            "depth": self.depth,
            "min_cluster_size": self.min_cluster_size,
            "seed": self.seed,
        }

    def _get_save_state(self):
        # the whole cluster tree (centers + per-leaf fitted models) pickles:
        # leaves hold classical recommenders whose state is dataframes/arrays
        return {
            "_root": self._root,
            "_feature_cols": self._feature_cols,
            "model_factory": self.model_factory,
        }

    def _features_of(self, query_features: pd.DataFrame, queries: np.ndarray) -> np.ndarray:
        order = pd.DataFrame({self.query_column: queries})
        merged = order.merge(query_features, on=self.query_column, how="left").fillna(0.0)
        return merged[self._feature_cols].to_numpy(dtype=np.float32)

    def _fit(self, dataset: Dataset) -> None:
        if dataset.query_features is None:
            msg = "HierarchicalRecommender requires query features"
            raise ValueError(msg)
        self._feature_cols = [
            c for c in dataset.query_features.columns if c != self.query_column
        ]
        self._root = self._fit_node(dataset, np.asarray(self.fit_queries), 0)

    def _fit_node(self, dataset: Dataset, queries: np.ndarray, depth: int) -> _Node:
        node = _Node(depth)
        if depth >= self.depth or len(queries) < self.branching * self.min_cluster_size:
            node.model = self.model_factory()
            sub = dataset.interactions[
                dataset.interactions[self.query_column].isin(queries)
            ]
            sub_ds = Dataset(
                dataset.feature_schema,
                sub,
                query_features=dataset.query_features,
                item_features=dataset.item_features,
                check_consistency=False,
            )
            node.model._fit_wrap(sub_ds)
            return node
        feats = self._features_of(dataset.query_features, queries)
        node.centers = _kmeans(feats, self.branching, seed=self.seed + depth)
        labels = np.asarray(_assign(jnp.asarray(feats), jnp.asarray(node.centers)))
        for c in range(len(node.centers)):
            members = queries[labels == c]
            if len(members) == 0:
                node.children.append(None)
                continue
            node.children.append(self._fit_node(dataset, members, depth + 1))
        return node

    def _route(self, node: _Node, feats: np.ndarray) -> np.ndarray:
        """Leaf index per row (flattened leaf ordering)."""
        if node.model is not None:
            return np.zeros(len(feats), dtype=np.int64)
        labels = np.asarray(_assign(jnp.asarray(feats), jnp.asarray(node.centers)))
        return labels

    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        chunks = []
        self._predict_node(
            self._root, dataset, k, np.asarray(queries), items, filter_seen_items, chunks
        )
        if not chunks:
            return pd.DataFrame(
                {self.query_column: [], self.item_column: [], self.rating_column: []}
            )
        return pd.concat(chunks, ignore_index=True)

    def _predict_node(self, node, dataset, k, queries, items, filter_seen, chunks):
        if len(queries) == 0 or node is None:
            return
        if node.model is not None:
            known = queries[np.isin(queries, node.model.fit_queries)]
            if len(known):
                chunks.append(
                    node.model._predict_wrap(
                        dataset, k, queries=known, items=items, filter_seen_items=filter_seen
                    )
                )
            return
        feats = self._features_of(dataset.query_features, queries)
        labels = self._route(node, feats)
        for c, child in enumerate(node.children):
            self._predict_node(
                child, dataset, k, queries[labels == c], items, filter_seen, chunks
            )
