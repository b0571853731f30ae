"""Hierarchical recommender: cluster tree over the ITEM space (HCB).

TPU-native analog of the reference (reference:
replay/experimental/models/hierarchical_recommender.py:13 — Node :129,
Clusterer :245, DiscreteClusterer :322), generalizing the HCB method of
Song et al. (arXiv 2110.09905).

The item space is recursively clustered into a tree of the given ``depth``
using the user-provided ``cluster_model`` (any sklearn-style clusterer with
``fit_predict``).  Each node mounts its own recommender instance (built
from ``recommender_class`` + ``recommender_params``) whose "items" are the
node's child clusters and whose item features are the cluster centroids;
the leaf level uses a discrete clusterer (every item its own cluster), so
the leaf recommenders rank real items.  Fitting counts each interaction at
every node on the root→item path; prediction descends the tree, each
internal recommender routing a query to its top-1 child cluster
(``k=1, filter_seen_items=False``), and the leaf recommender returning the
final top-k (with the caller's ``filter_seen_items``).
"""

import warnings
from typing import Optional, Type

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.models.base_rec import HybridRecommender


class DiscreteClusterer:
    """Every item is its own cluster (reference: hierarchical_recommender.py:322)."""

    def fit_predict(self, features: np.ndarray) -> np.ndarray:
        self.cluster_centers_ = features
        return np.arange(features.shape[0])


class _Clusterer:
    """Unified wrapper over sklearn-style clusterers (reference Clusterer :245)."""

    def __init__(self, model):
        self._model = model

    def fit(self, items: pd.DataFrame, item_column: str) -> None:
        items = items.sort_values(by=item_column)  # keeps DiscreteClusterer aligned
        ids = items[item_column].to_numpy()
        feats = items.drop(columns=[item_column]).to_numpy(dtype=np.float64)
        labels = np.asarray(self._model.fit_predict(feats)).astype(np.int64)
        self._cluster_map = dict(zip(ids, labels))
        self._item_map = dict(zip(labels, ids))  # meaningful when labels are unique
        frame = items.drop(columns=[item_column]).copy()
        frame["__cluster"] = labels
        self._centers = frame.groupby("__cluster").mean().reset_index()
        self._num_clusters = len(self._centers)

    def predict(self, item_ids) -> np.ndarray:
        return pd.Series(item_ids).map(self._cluster_map).to_numpy()

    def predict_items(self, cluster_ids) -> np.ndarray:
        return pd.Series(cluster_ids).map(self._item_map).to_numpy()

    @property
    def centers(self) -> pd.DataFrame:
        return self._centers

    @property
    def num_clusters(self) -> int:
        return self._num_clusters


class _Node:
    """Tree node: clusterer + mounted recommender (reference Node :129)."""

    def __init__(self, tree: "HierarchicalRecommender", level: int):
        self.tree = tree
        self.level = level
        self.is_leaf = level == tree.depth - 1
        self.clusterer = _Clusterer(
            DiscreteClusterer() if self.is_leaf else tree.cluster_model
        )
        self.recommender = tree._get_recommender()
        self.children: list = []

    # -- tree construction ---------------------------------------------------
    def procreate(self, items: pd.DataFrame) -> None:
        item_col = self.tree.item_column
        self.clusterer.fit(items, item_col)
        if not self.is_leaf:
            self.children = [None] * self.clusterer.num_clusters
            clusters = self.clusterer.predict(items[item_col].to_numpy())
            for cl_idx, cl_items in items.groupby(clusters):
                child = _Node(self.tree, self.level + 1)
                child.procreate(cl_items)
                self.children[int(cl_idx)] = child

    # -- fitting ---------------------------------------------------------
    def fit(self, log: pd.DataFrame, query_features: Optional[pd.DataFrame]) -> None:
        tree = self.tree
        clusters = self.clusterer.predict(log[tree.item_column].to_numpy())
        if not self.is_leaf:
            for cl_idx, cl_log in log.groupby(clusters):
                self.children[int(cl_idx)].fit(cl_log, query_features)
        node_log = log.drop(columns=[tree.item_column]).copy()
        node_log[tree.item_column] = clusters
        self.recommender.fit(tree._node_dataset(node_log, self.clusterer.centers, query_features))

    # -- prediction ------------------------------------------------------
    def predict(
        self,
        log: pd.DataFrame,
        k: int,
        queries: np.ndarray,
        items: np.ndarray,
        query_features: Optional[pd.DataFrame],
        filter_seen_items: bool,
        chunks: list,
    ) -> None:
        tree = self.tree
        if len(queries) == 0 or len(items) == 0:
            return
        if getattr(self.recommender, "fit_queries", None) is None:
            # this node's cluster had no training interactions (a cold item
            # category): its recommender was never fitted, so routing here
            # cannot produce recommendations — skip gracefully
            return
        item_clusters = self.clusterer.predict(items)
        log = log[log[tree.item_column].isin(set(items))]
        log_clusters = self.clusterer.predict(log[tree.item_column].to_numpy())
        node_log = log.drop(columns=[tree.item_column]).copy()
        node_log[tree.item_column] = log_clusters
        node_ds = tree._node_dataset(node_log, self.clusterer.centers, query_features)

        known = queries[np.isin(queries, self.recommender.fit_queries)]
        if len(known) == 0:
            return
        if self.is_leaf:
            recs = self.recommender._predict_wrap(
                node_ds,
                k,
                queries=known,
                items=np.unique(item_clusters),
                filter_seen_items=filter_seen_items,
            )
            recs = recs.copy()
            recs[tree.item_column] = self.clusterer.predict_items(
                recs[tree.item_column].to_numpy()
            )
            chunks.append(recs)
            return
        # route only toward clusters whose child recommender was fitted —
        # a cold item category (features but no training interactions) has
        # nothing to rank, and a bandit node's exploration bonus would
        # otherwise send every query there and return nothing
        routable = np.array(
            [
                cl
                for cl in np.unique(item_clusters)
                if self.children[int(cl)] is not None
                and getattr(self.children[int(cl)].recommender, "fit_queries", None)
                is not None
            ]
        )
        if len(routable) == 0:
            return
        routing = self.recommender._predict_wrap(
            node_ds,
            1,
            queries=known,
            items=routable,
            filter_seen_items=False,
        )
        top1 = routing.sort_values(tree.rating_column, ascending=False).drop_duplicates(
            tree.query_column
        )
        for cl_idx, grp in top1.groupby(tree.item_column):
            child = self.children[int(cl_idx)]
            if child is None:
                continue
            child.predict(
                log[log_clusters == int(cl_idx)] if len(log) else log,
                k,
                grp[tree.query_column].to_numpy(),
                items[item_clusters == int(cl_idx)],
                query_features,
                filter_seen_items,
                chunks,
            )


class HierarchicalRecommender(HybridRecommender):
    """Item-space cluster tree with a recommender per node (HCB).

    :param depth: depth of the item tree (the leaf level is discrete)
    :param cluster_model: sklearn-style clusterer instance used at every
        internal node (``fit_predict`` over the item-feature matrix)
    :param recommender_class: recommender CLASS (not an instance) mounted at
        each node; defaults to :class:`~replay_tpu.experimental.models.ULinUCB`
        like the reference
    :param recommender_params: init kwargs for the node recommenders
    """

    def __init__(
        self,
        depth: int = 2,
        cluster_model=None,
        recommender_class: Optional[Type] = None,
        recommender_params: Optional[dict] = None,
    ):
        if recommender_class is None:
            from replay_tpu.experimental.models.u_lin_ucb import ULinUCB

            recommender_class = ULinUCB
        if cluster_model is None:
            try:
                from sklearn.cluster import KMeans

                cluster_model = KMeans(n_clusters=2, n_init="auto", random_state=0)
            except ImportError as exc:  # pragma: no cover
                msg = "cluster_model is required when scikit-learn is unavailable"
                raise ValueError(msg) from exc
        self.depth = int(depth)
        self.cluster_model = cluster_model
        self.recommender_class = recommender_class
        self.recommender_params = dict(recommender_params or {})
        self._root: Optional[_Node] = None
        self._item_feature_cols = None
        self._query_feature_cols = None

    @property
    def _init_args(self):
        return {
            "depth": self.depth,
            "cluster_model": None,
            "recommender_class": None,
            "recommender_params": self.recommender_params,
        }

    def _get_save_state(self):
        # the whole tree pickles: clusterer maps/centers + fitted node models
        return {
            "_root": self._root,
            "cluster_model": self.cluster_model,
            "recommender_class": self.recommender_class,
            "_item_feature_cols": self._item_feature_cols,
            "_query_feature_cols": self._query_feature_cols,
        }

    def _get_recommender(self):
        rec = self.recommender_class(**self.recommender_params)
        return rec

    def _node_schema(self) -> FeatureSchema:
        infos = [
            FeatureInfo(
                self.query_column, FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID
            ),
            FeatureInfo(
                self.item_column, FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID
            ),
            FeatureInfo(
                self.rating_column,
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
        for col in self._item_feature_cols or []:
            infos.append(
                FeatureInfo(col, FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES)
            )
        for col in self._query_feature_cols or []:
            infos.append(
                FeatureInfo(col, FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES)
            )
        return FeatureSchema(infos)

    def _node_dataset(
        self,
        node_log: pd.DataFrame,
        centers: pd.DataFrame,
        query_features: Optional[pd.DataFrame],
    ) -> Dataset:
        if self.rating_column not in node_log.columns:
            node_log = node_log.copy()
            node_log[self.rating_column] = 1.0
        item_features = centers.rename(columns={"__cluster": self.item_column})
        return Dataset(
            self._node_schema(),
            node_log,
            query_features=query_features,
            item_features=item_features,
            check_consistency=False,
        )

    def _fit(self, dataset: Dataset) -> None:
        if dataset.item_features is None:
            msg = "HierarchicalRecommender requires item features"
            raise ValueError(msg)
        items = dataset.item_features
        self._item_feature_cols = [c for c in items.columns if c != self.item_column]
        qf = dataset.query_features
        self._query_feature_cols = (
            [c for c in qf.columns if c != self.query_column] if qf is not None else []
        )
        self._root = _Node(self, 0)
        self._root.procreate(items)
        keep = [self.query_column, self.item_column] + (
            [self.rating_column] if self.rating_column in dataset.interactions.columns else []
        )
        log = dataset.interactions[keep]
        # items without features cannot be placed in the tree (the clusterer
        # maps them to NaN, which would corrupt node logs / silently drop
        # rows from child fits) — drop them up front with a warning
        featureless = ~log[self.item_column].isin(items[self.item_column])
        if featureless.any():
            warnings.warn(
                f"dropping {int(featureless.sum())} interaction(s) whose items "
                "have no row in item_features — the cluster tree only covers "
                "featured items",
                stacklevel=2,
            )
            log = log[~featureless]
            if log.empty:
                msg = "no interactions remain after dropping featureless items"
                raise ValueError(msg)
        self._root.fit(log, qf)

    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        queries = np.asarray(queries)
        items = np.asarray(items)
        # the tree only knows items that had features at fit time; pd.Index
        # membership is dtype-robust (np.fromiter with the caller's dtype
        # truncates fixed-width strings / chokes on object ids)
        known_items = pd.Index(list(self._root.clusterer._cluster_map))
        items = items[pd.Index(items).isin(known_items)]
        keep = [self.query_column, self.item_column] + (
            [self.rating_column] if self.rating_column in dataset.interactions.columns else []
        )
        chunks: list = []
        self._root.predict(
            dataset.interactions[keep],
            k,
            queries,
            items,
            dataset.query_features,
            filter_seen_items,
            chunks,
        )
        if not chunks:
            return pd.DataFrame(
                {self.query_column: [], self.item_column: [], self.rating_column: []}
            )
        return pd.concat(chunks, ignore_index=True)
