"""Offline-bandit policy wrapper with native off-policy estimators.

TPU-native analog of the reference OBP connector (reference:
replay/experimental/scenarios/obp_wrapper/replay_offline.py:60
``OBPOfflinePolicyLearner``, utils.py:70 ``split_bandit_feedback``,
obp_optuna_objective.py:12 IPW/DM/DR criterion).  The reference delegates
policy-value estimation to the OpenBanditPipeline package; that package is
an optional dependency there and absent here, so the three estimators it
uses are implemented natively (they are short, well-defined formulas):

- ``ipw``  — inverse-propensity weighting:
  ``E[ r_i * pi(a_i|x_i,p_i) / pscore_i ]``;
- ``dm``   — direct method over a fitted reward model:
  ``E[ sum_a sum_p q_hat(x_i,a,p) * pi(a|x_i,p) ]``;
- ``dr``   — doubly robust: DM baseline + IPW-weighted residual.

The reward model backing dm/dr is a per-(action, position) ridge regression
on the round context (obp's ``RegressionModel`` with a linear base model).
``bandit_feedback`` uses OpenBanditPipeline's field names
``[n_rounds, n_actions, action, reward, context, action_context, position,
pscore]`` so logs prepared for obp drop in unchanged.
"""

import random
from importlib.util import find_spec
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from replay_tpu.models.optimization.search import Study, Trial, suggest_params
from replay_tpu.utils.types import FeatureUnavailableError

# the wrapper itself has no obp dependency (estimators are native); the
# flag only reports whether obp's own estimators could also be used
OBP_AVAILABLE = find_spec("obp") is not None


# ------------------------------------------------------------------ utils
def bandit_subset(
    borders: Sequence[int], bandit_feedback: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Rows ``[left, right)`` of every per-round field (reference:
    obp_wrapper/utils.py:37)."""
    left, right = borders
    out = {}
    for key, value in bandit_feedback.items():
        if key in ("n_rounds", "n_actions", "action_context"):
            out[key] = value
        elif value is None:
            out[key] = None
        else:
            out[key] = value[left:right]
    out["n_rounds"] = right - left
    return out


def split_bandit_feedback(
    bandit_feedback: Dict[str, np.ndarray], val_size: float = 0.3
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Head/tail split by round (reference: obp_wrapper/utils.py:70)."""
    n_rounds = bandit_feedback["n_rounds"]
    n_train = int(n_rounds * (1.0 - val_size))
    return (
        bandit_subset([0, n_train], bandit_feedback),
        bandit_subset([n_train, n_rounds], bandit_feedback),
    )


class _RidgeRewardModel:
    """q_hat(x, a, p): per-(action, position) ridge fit of reward on context
    (the linear instance of obp's RegressionModel, reference
    obp_wrapper/utils.py:7 get_est_rewards_by_reg)."""

    def __init__(self, n_actions: int, len_list: int, reg: float = 1.0):
        self.n_actions = n_actions
        self.len_list = len_list
        self.reg = reg

    def fit(self, context, action, reward, position=None):
        n = len(action)
        x = self._design(context, n)
        d = x.shape[1]
        position = np.zeros(n, dtype=np.int64) if position is None else position
        self.coef_ = np.zeros((self.n_actions, self.len_list, d), dtype=np.float64)
        self.mean_ = np.full((self.n_actions, self.len_list), reward.mean(), dtype=np.float64)
        for a in range(self.n_actions):
            for p in range(self.len_list):
                rows = (action == a) & (position == p)
                if not rows.any():
                    continue
                xa, ra = x[rows], reward[rows]
                self.mean_[a, p] = ra.mean()
                gram = xa.T @ xa + self.reg * np.eye(d)
                self.coef_[a, p] = np.linalg.solve(gram, xa.T @ (ra - ra.mean()))
        return self

    def predict(self, context, n_rounds: int) -> np.ndarray:
        """[n_rounds, n_actions, len_list] estimated rewards."""
        x = self._design(context, n_rounds)
        # q[i, a, p] = mean[a, p] + x_i . coef[a, p]
        return self.mean_[None] + np.einsum("id,apd->iap", x, self.coef_)

    @staticmethod
    def _design(context, n) -> np.ndarray:
        if context is None:
            return np.zeros((n, 1), dtype=np.float64)
        return np.asarray(context, dtype=np.float64)


def _iw(action_dist, action, position, pscore) -> np.ndarray:
    n = len(action)
    position = np.zeros(n, dtype=np.int64) if position is None else position
    pi = action_dist[np.arange(n), action, position]
    pscore = np.ones(n) if pscore is None else pscore
    return pi / np.maximum(pscore, 1e-12)


def estimate_policy_value(
    bandit_feedback: Dict[str, np.ndarray],
    action_dist: np.ndarray,
    criterion: str = "ipw",
    reward_model: Optional[_RidgeRewardModel] = None,
) -> float:
    """Off-policy value of ``action_dist`` on logged feedback.

    Estimator semantics match obp's InverseProbabilityWeighting /
    DirectMethod / DoublyRobust (the criteria the reference optimizes over,
    obp_optuna_objective.py:53-59).
    """
    action = np.asarray(bandit_feedback["action"])
    reward = np.asarray(bandit_feedback["reward"], dtype=np.float64)
    position = bandit_feedback.get("position")
    pscore = bandit_feedback.get("pscore")
    n = len(action)

    if criterion == "ipw":
        return float(np.mean(reward * _iw(action_dist, action, position, pscore)))

    if reward_model is None:
        msg = "dm/dr need a fitted reward model"
        raise ValueError(msg)
    q_hat = reward_model.predict(bandit_feedback.get("context"), n)
    dm_value = np.sum(q_hat * action_dist, axis=(1, 2))
    if criterion == "dm":
        return float(np.mean(dm_value))
    if criterion == "dr":
        pos = np.zeros(n, dtype=np.int64) if position is None else position
        q_taken = q_hat[np.arange(n), action, pos]
        iw = _iw(action_dist, action, position, pscore)
        return float(np.mean(dm_value + iw * (reward - q_taken)))
    msg = f"There is no criterion with name {criterion}"
    raise NotImplementedError(msg)


# ---------------------------------------------------------------- learner
class OBPOfflinePolicyLearner:
    """Any recommender as an offline bandit policy (reference:
    replay_offline.py:60).

    Rounds are synthetic one-interaction users; ``predict`` scores FRESH
    user ids each call (``max_usr_id`` advances like the reference's), so
    context features — not memorized ids — carry the personalization.
    """

    def __init__(self, model, n_actions: int, len_list: int = 1):
        self.model = model
        self.n_actions = n_actions
        self.len_list = len_list
        self.max_usr_id = 0
        self.log: Optional[pd.DataFrame] = None
        self.item_features: Optional[pd.DataFrame] = None
        self._user_features: Optional[pd.DataFrame] = None
        self._study: Optional[Study] = None

    # public alias kept for reference parity
    @property
    def replay_model(self):
        return self.model

    @staticmethod
    def _feature_cols(frame: Optional[pd.DataFrame], id_column: str) -> List[str]:
        if frame is None:
            return []
        return [c for c in frame.columns if c != id_column]

    @staticmethod
    def _context_frame(context, ids, id_column: str) -> pd.DataFrame:
        cols = {f"{id_column}_f{j}": context[:, j] for j in range(context.shape[1])}
        return pd.DataFrame({id_column: ids, **cols})

    def _schema(self, user_feature_cols, item_feature_cols):
        from replay_tpu.data.schema import (
            FeatureHint,
            FeatureInfo,
            FeatureSchema,
            FeatureSource,
            FeatureType,
        )

        infos = [
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
        infos += [
            FeatureInfo(c, FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES)
            for c in user_feature_cols
        ]
        infos += [
            FeatureInfo(c, FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES)
            for c in item_feature_cols
        ]
        return FeatureSchema(infos)

    def fit(
        self,
        action: np.ndarray,
        reward: np.ndarray,
        timestamp: Optional[np.ndarray] = None,
        context: Optional[np.ndarray] = None,
        action_context: Optional[np.ndarray] = None,
    ) -> None:
        """Fit the wrapped model on logged bandit data (reference:
        replay_offline.py:131 — one synthetic user per round)."""
        from replay_tpu.data.dataset import Dataset

        n = len(action)
        self.log = pd.DataFrame(
            {
                "query_id": np.arange(n),
                "item_id": np.asarray(action),
                "rating": np.asarray(reward, dtype=np.float64),
                "timestamp": (
                    np.asarray(timestamp) if timestamp is not None else np.arange(n)
                ),
            }
        )
        self.max_usr_id = n

        self._user_features = (
            self._context_frame(np.asarray(context), np.arange(n), "query_id")
            if context is not None
            else None
        )
        if action_context is not None:
            self.item_features = self._context_frame(
                np.asarray(action_context), np.arange(self.n_actions), "item_id"
            )

        dataset = Dataset(
            self._schema(self._feature_cols(self._user_features, "query_id"),
                         self._feature_cols(self.item_features, "item_id")),
            self.log,
            query_features=self._user_features,
            item_features=self.item_features,
            check_consistency=False,
        )
        self.model.fit(dataset)

    def predict(self, n_rounds: int = 1, context: Optional[np.ndarray] = None) -> np.ndarray:
        """Action distribution ``[n_rounds, n_actions, len_list]`` for new
        rounds (reference: replay_offline.py:178 — fresh user ids via
        ``_predict_proba`` with ``filter_seen_items=False``)."""
        from replay_tpu.data.dataset import Dataset

        new_ids = np.arange(self.max_usr_id, self.max_usr_id + n_rounds)
        user_features = self._user_features
        if context is not None:
            fresh = self._context_frame(np.asarray(context), new_ids, "query_id")
            user_features = (
                pd.concat([user_features, fresh], ignore_index=True)
                if user_features is not None
                else fresh
            )
        self.max_usr_id += n_rounds

        dataset = Dataset(
            self._schema(self._feature_cols(user_features, "query_id"),
                         self._feature_cols(self.item_features, "item_id")),
            self.log,
            query_features=user_features,
            item_features=self.item_features,
            check_consistency=False,
        )
        return self.model._predict_proba(
            dataset,
            self.len_list,
            queries=new_ids,
            items=np.arange(self.n_actions),
            filter_seen_items=False,
        )

    def optimize(
        self,
        bandit_feedback: Dict[str, np.ndarray],
        val_size: float = 0.3,
        param_borders: Optional[Dict[str, List[Any]]] = None,
        criterion: str = "ipw",
        budget: int = 10,
        new_study: bool = True,
    ) -> Optional[Dict[str, Any]]:
        """Tune the wrapped model's hyperparameters by off-policy value
        (reference: replay_offline.py:217 — IPW/DR/DM criterion over a
        bandit-feedback train/val split)."""
        train_fb, val_fb = split_bandit_feedback(bandit_feedback, val_size)
        if self.model._search_space is None:
            return None
        space = self.model._effective_search_space(param_borders)

        reward_model = None
        if criterion in ("dm", "dr"):
            reward_model = _RidgeRewardModel(self.n_actions, self.len_list).fit(
                train_fb.get("context"),
                train_fb["action"],
                train_fb["reward"],
                train_fb.get("position"),
            )

        def value_of(params: Dict[str, Any]) -> float:
            self.model.set_params(**params)
            self.fit(
                action=train_fb["action"],
                reward=train_fb["reward"],
                timestamp=np.arange(train_fb["n_rounds"]),
                context=train_fb.get("context"),
                action_context=train_fb.get("action_context"),
            )
            action_dist = self.predict(val_fb["n_rounds"], val_fb.get("context"))
            return estimate_policy_value(val_fb, action_dist, criterion, reward_model)

        if new_study or self._study is None:
            self._study = Study(seed=getattr(self.model, "_seed", 0) or 0)
        study = self._study
        rng = random.Random(study.seed + len(study.trials))
        for _ in range(budget):
            params = suggest_params(rng, space, study)
            study.trials.append(Trial(params=params, value=value_of(params)))
        return study.best_params
