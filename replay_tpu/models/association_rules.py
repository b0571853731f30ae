"""Association-rules item-to-item recommender.

TPU-native replacement for the reference (reference:
replay/models/association_rules.py:17 AssociationRulesItemRec): the Spark
self-join over sessions becomes a sparse session×item co-occurrence matmul
(pair counts = upper triangle of SᵀS), after which confidence / lift /
confidence_gain are vectorized numpy expressions.

Semantics mirror the reference exactly:
- interactions deduplicated per (session, item); ratings optional
  (``use_rating``) with pair rating = min of the two items' ratings,
- items below ``min_item_count`` dropped; pairs below ``min_pair_count``
  dropped,
- confidence(a→b) = pair_rating / rating(a);
  lift = N·confidence / rating(b);
  confidence_gain = confidence · (N − rating(a)) / (rating(b) − pair_rating)
  (∞ when the consequent only occurs with the antecedent),
- per-antecedent top-``num_neighbours`` kept by (lift desc, consequent desc).
"""

from typing import Optional

import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_neighbour_rec import NeighbourRec

_search_space = {
    "min_item_count": {"type": "int", "args": [3, 10]},
    "min_pair_count": {"type": "int", "args": [3, 10]},
    "num_neighbours": {"type": "int", "args": [300, 2000]},
    "use_rating": {"type": "categorical", "args": [True, False]},
    "similarity_metric": {"type": "categorical", "args": ["confidence", "lift"]},
}


class AssociationRulesItemRec(NeighbourRec):
    """Item-to-item rules with confidence / lift / confidence_gain scoring."""

    can_predict_item_to_item = True
    item_to_item_metrics = ["lift", "confidence", "confidence_gain"]
    can_change_metric = True
    _search_space = _search_space

    def __init__(
        self,
        session_column: Optional[str] = None,
        min_item_count: int = 5,
        min_pair_count: int = 5,
        num_neighbours: Optional[int] = 1000,
        use_rating: bool = False,
        similarity_metric: str = "confidence",
        index_builder=None,
    ):
        if similarity_metric not in self.item_to_item_metrics:
            msg = f"similarity_metric must be one of {self.item_to_item_metrics}"
            raise ValueError(msg)
        self.session_column = session_column
        self.min_item_count = min_item_count
        self.min_pair_count = min_pair_count
        self.num_neighbours = num_neighbours
        self.use_rating = use_rating
        self._similarity_metric = similarity_metric
        self.index_builder = index_builder
        self.rules: Optional[pd.DataFrame] = None

    @property
    def similarity_metric(self) -> str:
        return self._similarity_metric

    def get_similarity(self) -> pd.DataFrame:
        """Rules frame with confidence/lift/confidence_gain computed at fit
        (reference: replay/models/association_rules.py:292)."""
        return self.similarity

    @similarity_metric.setter
    def similarity_metric(self, value: str) -> None:
        if value not in self.item_to_item_metrics:
            msg = f"similarity_metric must be one of {self.item_to_item_metrics}"
            raise ValueError(msg)
        self._similarity_metric = value
        if self.rules is not None:
            self._install_similarity()

    @property
    def _init_args(self):
        return {
            "session_column": self.session_column,
            "min_item_count": self.min_item_count,
            "min_pair_count": self.min_pair_count,
            "num_neighbours": self.num_neighbours,
            "use_rating": self.use_rating,
            "similarity_metric": self._similarity_metric,
            "index_builder": None,
        }

    def _fit(self, dataset: Dataset) -> None:
        session_col = self.session_column or self.query_column
        inter = dataset.interactions
        rating = (
            inter[self.rating_column].to_numpy(dtype=np.float64)
            if self.use_rating and self.rating_column in inter.columns
            else np.ones(len(inter), dtype=np.float64)
        )
        frame = pd.DataFrame(
            {"s": inter[session_col].to_numpy(), "i": inter[self.item_column].to_numpy(), "r": rating}
        ).drop_duplicates(["s", "i"])

        sessions, s_pos = np.unique(frame["s"].to_numpy(), return_inverse=True)
        i_pos = np.searchsorted(self.fit_items, frame["i"].to_numpy())
        n_sessions, n_items = len(sessions), len(self.fit_items)
        r = frame["r"].to_numpy()

        item_rating = np.zeros(n_items)
        item_count = np.zeros(n_items)
        np.add.at(item_rating, i_pos, r)
        np.add.at(item_count, i_pos, 1)
        frequent = item_count >= self.min_item_count

        keep = frequent[i_pos]
        s_pos, i_pos, r = s_pos[keep], i_pos[keep], r[keep]

        # pair co-occurrence counts and min-rating sums via sparse products
        occ = csr_matrix((np.ones(len(r)), (s_pos, i_pos)), shape=(n_sessions, n_items))
        pair_count = (occ.T @ occ).tocoo()
        # pair_rating: Σ_sessions min(r_a, r_b).  With binary ratings this
        # equals pair_count; with real ratings compute per-session mins
        # through two thresholded products when ratings vary.
        if self.use_rating and not np.allclose(r, r[0] if len(r) else 1.0):
            # real-valued ratings: pair rating = Σ_sessions min(r_a, r_b),
            # computed on the self-joined pair frame
            frame2 = pd.DataFrame({"s": s_pos, "i": i_pos, "r": r})
            merged = frame2.merge(frame2, on="s")
            merged = merged[merged["i_x"] < merged["i_y"]]
            pr = merged.groupby(["i_x", "i_y"])["r_x"].count()  # count for filter
            prr = merged.assign(m=np.minimum(merged["r_x"], merged["r_y"])).groupby(
                ["i_x", "i_y"]
            )["m"].sum()
            a_idx = prr.index.get_level_values(0).to_numpy()
            b_idx = prr.index.get_level_values(1).to_numpy()
            counts = pr.to_numpy()
            ratings_sum = prr.to_numpy()
        else:
            mask_ut = pair_count.row < pair_count.col
            a_idx = pair_count.row[mask_ut]
            b_idx = pair_count.col[mask_ut]
            counts = pair_count.data[mask_ut]
            ratings_sum = counts.astype(np.float64)

        keep_pairs = counts >= self.min_pair_count
        a_idx, b_idx, ratings_sum = a_idx[keep_pairs], b_idx[keep_pairs], ratings_sum[keep_pairs]

        # symmetrize (a→b and b→a)
        ant = np.concatenate([a_idx, b_idx])
        con = np.concatenate([b_idx, a_idx])
        pr = np.concatenate([ratings_sum, ratings_sum])

        confidence = pr / item_rating[ant]
        lift = n_sessions * confidence / item_rating[con]
        denom = item_rating[con] - pr
        confidence_gain = np.where(
            denom == 0,
            np.inf,
            confidence * (n_sessions - item_rating[ant]) / np.where(denom == 0, 1.0, denom),
        )

        rules = pd.DataFrame(
            {
                "item_idx_one": ant,
                "item_idx_two": con,
                "confidence": confidence,
                "lift": lift,
                "confidence_gain": confidence_gain,
            }
        )
        if self.num_neighbours is not None:
            rules = (
                rules.sort_values(
                    ["item_idx_one", "lift", "item_idx_two"],
                    ascending=[True, False, False],
                    kind="stable",
                )
                .groupby("item_idx_one", sort=False)
                .head(self.num_neighbours)
            )
        self.rules = rules.reset_index(drop=True)
        self._install_similarity()

    def _install_similarity(self) -> None:
        n_items = len(self.fit_items)
        sim = np.zeros((n_items, n_items), dtype=np.float32)
        vals = self.rules[self._similarity_metric].to_numpy(dtype=np.float64)
        vals = np.where(np.isinf(vals), np.finfo(np.float32).max / 2, vals)
        sim[
            self.rules["item_idx_one"].to_numpy(), self.rules["item_idx_two"].to_numpy()
        ] = vals.astype(np.float32)
        self._set_similarity_dense(sim)

    def get_item_to_item_rules(self) -> pd.DataFrame:
        """Rule table with all three metrics, item ids decoded."""
        out = self.rules.copy()
        out["item_idx_one"] = self.fit_items[out["item_idx_one"].to_numpy()]
        out["item_idx_two"] = self.fit_items[out["item_idx_two"].to_numpy()]
        return out

    def get_nearest_items(self, items, k, metric=None) -> pd.DataFrame:
        if metric is not None and metric not in self.item_to_item_metrics:
            msg = f"metric must be one of {self.item_to_item_metrics}"
            raise ValueError(msg)
        prev = self._similarity_metric
        if metric is not None and metric != prev:
            self.similarity_metric = metric
        try:
            return super().get_nearest_items(items, k)
        finally:
            if metric is not None and metric != prev:
                self.similarity_metric = prev

    def _get_ann_infer_params(self) -> dict:
        return {"features_col": None}
