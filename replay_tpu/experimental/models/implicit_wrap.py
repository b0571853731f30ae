"""ImplicitWrap: wrapper over the ``implicit`` library (optional dependency).

TPU-native analog of the reference (reference:
replay/experimental/models/implicit_wrap.py:10).  Lazy import with a clear
error when absent; when installed, any implicit model (ALS, BPR, ...) can
be wrapped with the standard fit/predict interface.
"""

from importlib.util import find_spec

import numpy as np
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

IMPLICIT_AVAILABLE = find_spec("implicit") is not None


class ImplicitWrap(Recommender):
    """Wrap any fitted-interface model from the `implicit` library."""

    def __init__(self, model):
        if not IMPLICIT_AVAILABLE:
            msg = (
                "implicit is not installed. ImplicitWrap relies on manual dependency "
                "installation: pip install implicit"
            )
            raise ImportError(msg)
        self.model = model

    @property
    def _init_args(self):
        return {"model": None}  # the fitted model travels via _get_save_state

    def _get_save_state(self):
        # reference pickles the implicit model next to the init args
        # (implicit_wrap.py:41-45); the csr log is needed for recommend()
        return {"model": self.model, "_mat": getattr(self, "_mat", None)}

    def _fit(self, dataset: Dataset) -> None:  # pragma: no cover - needs implicit
        inter = dataset.interactions
        q = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy())
        i = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy())
        r = (
            inter[self.rating_column].to_numpy(dtype=np.float32)
            if self.rating_column in inter.columns
            else np.ones(len(inter), dtype=np.float32)
        )
        self._mat = csr_matrix(
            (r, (q, i)), shape=(len(self.fit_queries), len(self.fit_items))
        )
        self.model.fit(self._mat)

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:  # pragma: no cover
        q_pos = np.searchsorted(self.fit_queries, query_ids)
        i_pos = np.searchsorted(self.fit_items, item_ids)
        scores = np.zeros((len(q_pos), len(i_pos)), dtype=np.float32)
        # restrict recommend() to the requested item block (the reference's
        # items_to_use path, implicit_wrap.py:62) so every block item gets
        # a score, not just the global top-N
        ids, vals = self.model.recommend(
            q_pos,
            self._mat[q_pos],
            N=len(i_pos),
            filter_already_liked_items=False,
            items=i_pos,
        )
        for row in range(len(q_pos)):
            pos = np.searchsorted(i_pos, ids[row])
            valid = (pos < len(i_pos)) & (i_pos[np.minimum(pos, len(i_pos) - 1)] == ids[row])
            scores[row, pos[valid]] = vals[row][valid]
        return scores
