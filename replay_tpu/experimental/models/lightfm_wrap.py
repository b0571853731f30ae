"""LightFMWrap: wrapper over the ``lightfm`` library (optional dependency).

TPU-native analog of the reference (reference:
replay/experimental/models/lightfm_wrap.py:19).  ``lightfm`` is a
C-extension package that must be installed manually; this module imports
lazily and raises a clear error when absent — the reference's conditional
import contract (replay/experimental/models/__init__.py:34-50).
"""

from importlib.util import find_spec
from typing import Optional

import numpy as np
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

LIGHTFM_AVAILABLE = find_spec("lightfm") is not None


class LightFMWrap(Recommender):
    """Hybrid matrix factorization via lightfm (requires `pip install lightfm`)."""

    def __init__(
        self,
        no_components: int = 128,
        loss: str = "warp",
        random_state: Optional[int] = None,
        epochs: int = 10,
    ):
        if not LIGHTFM_AVAILABLE:
            msg = (
                "lightfm is not installed. LightFMWrap relies on manual dependency "
                "installation: pip install lightfm"
            )
            raise ImportError(msg)
        self.no_components = no_components
        self.loss = loss
        self.random_state = random_state
        self.epochs = epochs
        self.model = None

    @property
    def _init_args(self):
        return {
            "no_components": self.no_components,
            "loss": self.loss,
            "random_state": self.random_state,
            "epochs": self.epochs,
        }

    def _fit(self, dataset: Dataset) -> None:  # pragma: no cover - needs lightfm
        from lightfm import LightFM

        inter = dataset.interactions
        q = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy())
        i = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy())
        mat = csr_matrix(
            (np.ones(len(inter)), (q, i)),
            shape=(len(self.fit_queries), len(self.fit_items)),
        )
        self.model = LightFM(
            no_components=self.no_components, loss=self.loss, random_state=self.random_state
        )
        self.model.fit(mat, epochs=self.epochs)

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:  # pragma: no cover
        q_pos = np.searchsorted(self.fit_queries, query_ids)
        i_pos = np.searchsorted(self.fit_items, item_ids)
        users = np.repeat(q_pos, len(i_pos))
        items = np.tile(i_pos, len(q_pos))
        scores = self.model.predict(users.astype(np.int32), items.astype(np.int32))
        return scores.reshape(len(q_pos), len(i_pos))
