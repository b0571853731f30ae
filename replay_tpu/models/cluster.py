"""ClusterRec: k-means over query features → per-cluster item popularity.

TPU-native replacement for the reference (reference:
replay/models/cluster.py:14 ClusterRec, which runs Spark ML KMeans).
K-means here is Lloyd's algorithm as jitted device matmuls — the [N, K]
distance matrix per iteration is one GEMM — with k-means++-style seeding
from a fixed RNG.  Per-cluster item relevance = item count / max count in
cluster, exactly the reference's normalization.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import QueryRecommender

_search_space = {
    "num_clusters": {"type": "int", "args": [2, 20]},
}


@jax.jit
def _assign(points: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    d2 = (
        jnp.sum(points**2, axis=1)[:, None]
        - 2 * jnp.dot(points, centers.T, preferred_element_type=jnp.float32)
        + jnp.sum(centers**2, axis=1)[None]
    )
    return jnp.argmin(d2, axis=1)


def _kmeans(points: np.ndarray, k: int, n_iter: int = 25, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    k = min(k, len(points))
    centers = points[rng.choice(len(points), size=k, replace=False)].astype(np.float32)
    pts = jnp.asarray(points.astype(np.float32))
    for _ in range(n_iter):
        labels = np.asarray(_assign(pts, jnp.asarray(centers)))
        for c in range(k):
            members = points[labels == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


class ClusterRec(QueryRecommender):
    """Cold-start recommendations via query-feature clusters."""

    can_predict_cold_queries = True
    _search_space = _search_space

    def __init__(self, num_clusters: int = 10, n_iter: int = 25, seed: int = 0):
        self.num_clusters = num_clusters
        self.n_iter = n_iter
        self.seed = seed
        self.cluster_centers: Optional[np.ndarray] = None
        self.item_rel_in_cluster: Optional[pd.DataFrame] = None
        self._feature_columns: Optional[list] = None

    @property
    def _init_args(self):
        return {"num_clusters": self.num_clusters, "n_iter": self.n_iter, "seed": self.seed}

    @property
    def _dataframes(self):
        return {"item_rel_in_cluster": self.item_rel_in_cluster}

    def _get_save_state(self):
        # the fitted feature-column order is load-bearing: _query_matrix
        # indexes query features by it (round-5 roundtrip-drive finding —
        # a loaded model crashed on predict without it)
        return {"_feature_columns": self._feature_columns}

    def _set_save_state(self, state):
        cols = state.get("_feature_columns")
        if cols is not None:
            self._feature_columns = list(cols)

    def _query_matrix(self, query_features: pd.DataFrame) -> np.ndarray:
        return query_features[self._feature_columns].to_numpy(dtype=np.float32)

    def _clusters_for(self, query_features: pd.DataFrame) -> np.ndarray:
        return np.asarray(
            _assign(
                jnp.asarray(self._query_matrix(query_features)),
                jnp.asarray(self.cluster_centers),
            )
        )

    def _fit(self, dataset: Dataset) -> None:
        features = dataset.query_features
        self._feature_columns = [c for c in features.columns if c != self.query_column]
        matrix = self._query_matrix(features)
        self.cluster_centers = _kmeans(matrix, self.num_clusters, self.n_iter, self.seed)

        clusters = self._clusters_for(features)
        cluster_of_query = pd.DataFrame(
            {self.query_column: features[self.query_column].to_numpy(), "cluster": clusters}
        )
        inter = dataset.interactions.merge(cluster_of_query, on=self.query_column, how="left")
        counts = (
            inter.groupby(["cluster", self.item_column]).size().rename("item_count").reset_index()
        )
        max_in_cluster = counts.groupby("cluster")["item_count"].transform("max")
        counts[self.rating_column] = counts["item_count"] / max_in_cluster
        self.item_rel_in_cluster = counts.drop(columns=["item_count"])

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None or dataset.query_features is None:
            msg = "ClusterRec requires query features at predict time"
            raise ValueError(msg)
        features = dataset.query_features
        features = features[features[self.query_column].isin(query_ids)]
        # align rows to query_ids; queries without features get zero scores
        order = pd.DataFrame({self.query_column: query_ids})
        features = order.merge(features, on=self.query_column, how="left")
        has_features = ~features[self._feature_columns[0]].isna().to_numpy()
        filled = features.fillna(0.0)
        clusters = self._clusters_for(filled)

        rel = self.item_rel_in_cluster.pivot_table(
            index="cluster", columns=self.item_column, values=self.rating_column, fill_value=0.0
        )
        n_clusters = len(self.cluster_centers)
        table = np.zeros((n_clusters, len(item_ids)), dtype=np.float32)
        col_pos = {item: j for j, item in enumerate(item_ids)}
        for item in rel.columns:
            if item in col_pos:
                table[rel.index.to_numpy(), col_pos[item]] = rel[item].to_numpy()
        scores = table[clusters]
        scores[~has_features] = 0.0
        return scores
