"""Neighbourhood recommender base (reference: replay/models/base_neighbour_rec.py:23).

score(u, j) = Σ_{i ∈ history(u)} sim(i, j), computed on device as a blocked
dense matmul R_block @ S where R is the binary user-profile matrix built from
the *prediction-time* dataset and S is the truncated item-item similarity.
"""

from abc import ABC
from typing import Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender


class NeighbourRec(Recommender, ABC):
    """Base class for models that predict via an item-item similarity matrix."""

    similarity: pd.DataFrame  # columns: item_idx_one, item_idx_two, similarity
    can_predict_item_to_item: bool = True
    can_predict_cold_queries: bool = True
    can_change_metric: bool = False
    item_to_item_metrics = ["similarity"]
    _similarity_metric = "similarity"

    _sim_dense: Optional[jnp.ndarray] = None  # [n_fit_items, n_fit_items]

    @property
    def _dataframes(self):
        return {"similarity": self.similarity}

    def _get_save_state(self):
        return {"sim_dense_np": np.asarray(self._sim_dense) if self._sim_dense is not None else None}

    def _set_save_state(self, state):
        arr = state.get("sim_dense_np")
        if arr is not None:
            self._sim_dense = jnp.asarray(arr)

    @property
    def similarity_metric(self):
        return self._similarity_metric

    @similarity_metric.setter
    def similarity_metric(self, value):
        if not self.can_change_metric:
            msg = "This class does not support changing similarity metrics"
            raise ValueError(msg)
        if value not in self.item_to_item_metrics:
            msg = f"Select one of the valid metrics for predict: {self.item_to_item_metrics}"
            raise ValueError(msg)
        self._similarity_metric = value

    def _clear_cache(self):
        self._sim_dense = None
        self._sparse_index = None

    # -- device structures ---------------------------------------------------
    def _set_similarity_dense(self, sim: np.ndarray) -> None:
        """Install the [n_fit_items, n_fit_items] similarity matrix on device and
        mirror it as the reference-compatible long-format frame."""
        self._sim_dense = jnp.asarray(sim, dtype=jnp.float32)
        self._sparse_index = None  # rebuilt lazily from the new similarity
        rows, cols = np.nonzero(sim)
        self.similarity = pd.DataFrame(
            {
                "item_idx_one": self.fit_items[rows],
                "item_idx_two": self.fit_items[cols],
                "similarity": sim[rows, cols].astype(np.float64),
            }
        )

    def _profiles_sparse(self, query_ids: np.ndarray, dataset: Dataset) -> csr_matrix:
        """Binary [len(query_ids), n_fit_items] CSR profile matrix from the
        prediction dataset's interactions (duplicates accumulate, matching the
        reference's raw-join semantics)."""
        inter = dataset.interactions
        q = inter[self.query_column].to_numpy()
        i = inter[self.item_column].to_numpy()
        q_pos = np.searchsorted(query_ids, q)
        valid_q = (q_pos < len(query_ids)) & (
            query_ids[np.minimum(q_pos, len(query_ids) - 1)] == q
        )
        i_pos = np.searchsorted(self.fit_items, i)
        valid_i = (i_pos < len(self.fit_items)) & (
            self.fit_items[np.minimum(i_pos, len(self.fit_items) - 1)] == i
        )
        keep = valid_q & valid_i
        return csr_matrix(
            (np.ones(int(keep.sum()), dtype=np.float32), (q_pos[keep], i_pos[keep])),
            shape=(len(query_ids), len(self.fit_items)),
        )

    def _profiles_for(self, query_ids: np.ndarray, dataset: Dataset) -> np.ndarray:
        return self._profiles_sparse(query_ids, dataset).toarray()

    # -- sparse-index serving (nmslib-analog) --------------------------------
    index_builder = None
    _sparse_index = None

    def init_index_builder(self, index_builder=None) -> None:
        """Install (or clear) the sparse item-item index parameters
        (reference: replay/models/extensions/ann/ann_mixin.py:35 — NeighbourRec
        models serve via an index over the similarity matrix).  Accepts a
        ``SparseSimParam`` instance or a kwargs dict for one; the in-tree
        sparse scorer is exact, so no graph hyperparameters exist."""
        from replay_tpu.ann.mixin import SparseSimParam

        if index_builder is None or isinstance(index_builder, SparseSimParam):
            self.index_builder = index_builder
        elif isinstance(index_builder, dict):
            self.index_builder = SparseSimParam(**index_builder)
        else:
            msg = f"unsupported index_builder: {type(index_builder).__name__}"
            raise TypeError(msg)
        self._sparse_index = None

    def init_builder_from_dict(self, init_meta: dict) -> None:
        """Rebuild index parameters from saved init meta (reference:
        ann_mixin.py:194)."""
        from replay_tpu.ann.mixin import SparseSimParam

        param_meta = init_meta.get("index_param", init_meta)
        self.index_builder = SparseSimParam(**param_meta.get("init_args", {}))
        self._sparse_index = None

    def _build_sparse_index(self):
        """Install the similarity matrix into the native sparse scorer
        (reference: nmslib index over the item-item matrix,
        index_builders/*nmslib*.py)."""
        from replay_tpu.ann.hnsw import SparseSimilarityIndex

        self._sparse_index = SparseSimilarityIndex(
            csr_matrix(np.asarray(self._sim_dense))
        )
        return self._sparse_index

    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        # index-backed path (reference NeighbourRec ANN contract,
        # ann_mixin.py:126-180) when scoring the full fitted catalog
        if self.index_builder is not None and len(items) == len(self.fit_items):
            if self._sparse_index is None:
                self._build_sparse_index()
            profiles = self._profiles_sparse(queries, dataset)
            exclude = None
            if filter_seen_items:
                # seen = the profile's own nonzero columns
                exclude = [
                    profiles.indices[profiles.indptr[r] : profiles.indptr[r + 1]]
                    for r in range(profiles.shape[0])
                ]
            labels, scores = self._sparse_index.search(profiles, k, exclude)
            rows = []
            short = []
            for r, qid in enumerate(queries):
                count = 0
                for pos in range(k):
                    if labels[r, pos] < 0:
                        break
                    rows.append((qid, self.fit_items[labels[r, pos]], float(scores[r, pos])))
                    count += 1
                if count < k:
                    short.append(qid)
            frame = pd.DataFrame(
                rows, columns=[self.query_column, self.item_column, self.rating_column]
            )
            if short:
                # the sparse kernel only scores items the profile touches;
                # cold queries / sparse profiles can come back with fewer
                # than k rows while the exact path pads with zero-score
                # unseen items — match it by re-predicting the short queries
                # exactly (NeighbourRec.can_predict_cold_queries contract)
                short_arr = np.asarray(short)
                exact = super()._predict(
                    dataset, k, short_arr, items, filter_seen_items
                )
                frame = pd.concat(
                    [frame[~frame[self.query_column].isin(short_arr)], exact],
                    ignore_index=True,
                )
            return frame
        return super()._predict(dataset, k, queries, items, filter_seen_items)

    def _score_block(
        self, query_ids: np.ndarray, item_ids: np.ndarray, dataset: Optional[Dataset] = None
    ) -> np.ndarray:
        if dataset is None:
            msg = "interactions are not provided, but required for prediction"
            raise ValueError(msg)
        profiles = jnp.asarray(self._profiles_for(query_ids, dataset))
        scores = jnp.dot(profiles, self._sim_dense, preferred_element_type=jnp.float32)
        item_pos = np.searchsorted(self.fit_items, item_ids)
        return np.asarray(scores)[:, item_pos]

    def get_nearest_items(
        self, items, k: int, metric: Optional[str] = None
    ) -> pd.DataFrame:
        """Top-k most similar items for each given item."""
        if metric is not None and metric not in self.item_to_item_metrics:
            msg = f"Select one of the valid metrics for predict: {self.item_to_item_metrics}"
            raise ValueError(msg)
        items = np.asarray(list(items) if not isinstance(items, np.ndarray) else items)
        pos = np.searchsorted(self.fit_items, items)
        sims = np.asarray(self._sim_dense)[pos]
        k_eff = min(k, sims.shape[1])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :k_eff]
        vals = np.take_along_axis(sims, idx, axis=1)
        # public contract: [item_column, neighbour_item_idx, similarity]
        # (reference: replay/models/base_rec.py:662-663 renames the internal
        # item_idx_one/item_idx_two pair on the way out)
        out = pd.DataFrame(
            {
                self.item_column: np.repeat(items, k_eff),
                "neighbour_item_idx": self.fit_items[idx.ravel()],
                "similarity": vals.ravel().astype(np.float64),
            }
        )
        return out[out["similarity"] != 0]
