"""OBP offline-bandit wrapper (optional ``obp`` dependency).

TPU-native analog of the reference (reference:
replay/experimental/scenarios/obp_wrapper/replay_offline.py — wraps any
RePlay model as an OBP OfflineBanditPolicy for off-policy evaluation).
``obp`` is not bundled; the wrapper imports lazily and raises a clear
error when absent, per the conditional-import contract.
"""

from importlib.util import find_spec
from typing import Optional

import numpy as np
import pandas as pd

OBP_AVAILABLE = find_spec("obp") is not None


class OBPOfflinePolicyLearner:
    """Learn/evaluate a recommender as an offline bandit policy."""

    def __init__(
        self,
        model,
        n_actions: int,
        len_list: int = 1,
    ):
        if not OBP_AVAILABLE:
            msg = (
                "obp is not installed. The OBP wrapper relies on manual dependency "
                "installation: pip install obp"
            )
            raise ImportError(msg)
        self.model = model
        self.n_actions = n_actions
        self.len_list = len_list

    def fit(
        self,
        action: np.ndarray,
        reward: np.ndarray,
        context: Optional[np.ndarray] = None,
        timestamp: Optional[np.ndarray] = None,
    ) -> None:  # pragma: no cover - needs obp
        from replay_tpu.data.dataset import Dataset
        from replay_tpu.data.schema import (
            FeatureHint,
            FeatureInfo,
            FeatureSchema,
            FeatureSource,
            FeatureType,
        )

        log = pd.DataFrame(
            {
                "query_id": np.arange(len(action)) if context is None else context[:, 0],
                "item_id": action,
                "rating": reward,
                "timestamp": timestamp if timestamp is not None else np.arange(len(action)),
            }
        )
        schema = FeatureSchema(
            [
                FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
                FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
                FeatureInfo(
                    "rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                    feature_source=FeatureSource.INTERACTIONS,
                ),
                FeatureInfo(
                    "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                    feature_source=FeatureSource.INTERACTIONS,
                ),
            ]
        )
        self.model.fit(Dataset(schema, log))

    def predict(self, n_rounds: int, context: Optional[np.ndarray] = None) -> np.ndarray:  # pragma: no cover
        """Action distribution [n_rounds, n_actions, len_list] for OBP's
        off-policy estimators."""
        scores = self.model._score_block(
            np.arange(n_rounds), np.arange(self.n_actions), None
        )
        order = np.argsort(-scores, axis=1)[:, : self.len_list]
        dist = np.zeros((n_rounds, self.n_actions, self.len_list))
        for pos in range(self.len_list):
            dist[np.arange(n_rounds), order[:, pos], pos] = 1.0
        return dist
