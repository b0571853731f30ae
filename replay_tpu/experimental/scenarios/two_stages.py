"""Two-stage scenario: candidate generation → learned reranking.

TPU-native analog of the reference (reference:
replay/experimental/scenarios/two_stages/two_stages_scenario.py:112
TwoStagesScenario + reranker.py).  Capability parity:

- **ReRanker abstraction** (reference reranker.py:25): a pluggable
  second-stage model; :class:`GBMReRanker` (sklearn
  HistGradientBoostingClassifier, in-image) replaces the reference's
  LightAutoML ``LamaWrap``.
- **Fallback filling** (reference ``_get_first_level_candidates`` :446):
  users whose first-level candidate list is short are topped up from
  ``fallback_model`` recommendations.
- **Negative strategies** (reference ``negatives_type``): ``first_level``
  (non-relabeled first-level candidates) or ``random`` (uniform unseen
  items).
- **First-level model features** (reference
  ``get_first_level_model_features`` :30): per-model flag to join user /
  item factor vectors and their elementwise product into the reranker's
  feature frame (zero vectors for cold entities).
- **Feature enrichment** (reference ``_add_features_for_second_level``
  :236): first-level scores and ranks, per-user/per-item log statistics,
  numeric user/item features from the dataset, and optionally the
  HistoryBasedFeaturesProcessor's generated features
  (``use_generated_features``).
- ``fit_predict`` and a first-level ``optimize`` loop (reference :618/:675).
"""

from typing import List, Optional, Union

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import BaseRecommender, HybridRecommender
from replay_tpu.models.pop_rec import PopRec
from replay_tpu.preprocessing.history_based_fp import HistoryBasedFeaturesProcessor
from replay_tpu.splitters.ratio_splitter import RatioSplitter


def get_first_level_model_features(
    model: BaseRecommender,
    pairs: pd.DataFrame,
    query_column: str,
    item_column: str,
    add_factors_mult: bool = True,
    prefix: str = "",
) -> pd.DataFrame:
    """User/item factor features for (query, item) pairs (reference:
    two_stages_scenario.py:30).  Zero vectors are used for entities the
    model has no factors for."""
    q_vec = getattr(model, "query_factors", None)
    i_vec = None
    if hasattr(model, "_get_item_vectors"):
        try:
            i_vec = model._get_item_vectors()
        except (NotImplementedError, AttributeError, TypeError):
            i_vec = None
    out = {}
    uf = vf = None
    if q_vec is not None:
        pos = np.searchsorted(model.fit_queries, pairs[query_column].to_numpy())
        pos = np.clip(pos, 0, len(model.fit_queries) - 1)
        known = model.fit_queries[pos] == pairs[query_column].to_numpy()
        uf = np.where(known[:, None], q_vec[pos], 0.0)
        for d in range(uf.shape[1]):
            out[f"{prefix}_uf_{d}"] = uf[:, d]
    if i_vec is not None:
        pos = np.searchsorted(model.fit_items, pairs[item_column].to_numpy())
        pos = np.clip(pos, 0, len(model.fit_items) - 1)
        known = model.fit_items[pos] == pairs[item_column].to_numpy()
        vf = np.where(known[:, None], i_vec[pos], 0.0)
        for d in range(vf.shape[1]):
            out[f"{prefix}_if_{d}"] = vf[:, d]
    if add_factors_mult and uf is not None and vf is not None:
        dim = min(uf.shape[1], vf.shape[1])
        mult = uf[:, :dim] * vf[:, :dim]
        for d in range(dim):
            out[f"{prefix}_fm_{d}"] = mult[:, d]
    return pd.DataFrame(out, index=pairs.index)


class ReRanker:
    """Base class for second-stage rerankers (reference: reranker.py:25).

    ``fit(data, target)`` receives a numeric feature frame and binary
    labels; ``predict(data)`` returns relevance scores."""

    def fit(self, data: pd.DataFrame, target: np.ndarray) -> None:
        raise NotImplementedError

    def predict(self, data: pd.DataFrame) -> np.ndarray:
        raise NotImplementedError


class GBMReRanker(ReRanker):
    """Gradient-boosted tree reranker — the in-image stand-in for the
    reference's LightAutoML ``LamaWrap`` (reranker.py:63)."""

    def __init__(self, seed: int = 123, **params):
        self.seed = seed
        self.params = params
        self.model = None

    def fit(self, data: pd.DataFrame, target: np.ndarray) -> None:
        from sklearn.ensemble import HistGradientBoostingClassifier

        self.model = HistGradientBoostingClassifier(
            random_state=self.seed, **self.params
        )
        self.model.fit(data.to_numpy(dtype=np.float64), target)

    def predict(self, data: pd.DataFrame) -> np.ndarray:
        return self.model.predict_proba(data.to_numpy(dtype=np.float64))[:, 1]


class TwoStagesScenario(HybridRecommender):
    """Candidate generation + learned reranking."""

    can_predict_cold_queries = True

    def __init__(
        self,
        first_level_models: Optional[List[BaseRecommender]] = None,
        fallback_model: Optional[BaseRecommender] = None,
        train_splitter: Optional[RatioSplitter] = None,
        use_first_level_models_feat: Union[bool, List[bool]] = False,
        second_model: Optional[ReRanker] = None,
        num_negatives: int = 100,
        negatives_type: str = "first_level",
        use_generated_features: bool = False,
        user_cat_features_list: Optional[list] = None,
        item_cat_features_list: Optional[list] = None,
        custom_features_processor: Optional[HistoryBasedFeaturesProcessor] = None,
        k_first_level: int = 100,
        seed: int = 123,
    ):
        self.first_level_models = first_level_models or [PopRec()]
        if isinstance(use_first_level_models_feat, bool):
            use_first_level_models_feat = [use_first_level_models_feat] * len(
                self.first_level_models
            )
        if len(use_first_level_models_feat) != len(self.first_level_models):
            msg = (
                "use_first_level_models_feat must have one flag per first-level "
                f"model: {len(use_first_level_models_feat)} flags for "
                f"{len(self.first_level_models)} models"
            )
            raise ValueError(msg)
        self.use_first_level_models_feat = use_first_level_models_feat
        if negatives_type not in ("random", "first_level"):
            msg = (
                f"Invalid negatives_type value: {negatives_type}. "
                "Use 'random' or 'first_level'"
            )
            raise ValueError(msg)
        self.negatives_type = negatives_type
        self.fallback_model = fallback_model
        self.train_splitter = train_splitter
        self.second_stage_model = second_model or GBMReRanker(seed=seed)
        self.num_negatives = num_negatives
        self.use_generated_features = use_generated_features
        self.features_processor = custom_features_processor
        self.user_cat_features_list = user_cat_features_list
        self.item_cat_features_list = item_cat_features_list
        self.k_first_level = k_first_level
        self.seed = seed
        self._stats: Optional[dict] = None
        self._user_num_feats: Optional[pd.DataFrame] = None
        self._item_num_feats: Optional[pd.DataFrame] = None
        self._feature_columns: Optional[list] = None
        self._first_ds = None

    @property
    def _init_args(self):
        return {
            "num_negatives": self.num_negatives,
            "negatives_type": self.negatives_type,
            "use_generated_features": self.use_generated_features,
            "k_first_level": self.k_first_level,
            "seed": self.seed,
        }

    def _get_save_state(self):
        """Composite state pickles whole: first-level models (dataframe/
        array state), the sklearn GBM reranker, feature processors, and the
        feature caches predict needs."""
        state = {}
        for attr in (
            "first_level_models", "fallback_model", "second_stage_model",
            "features_processor", "_stats", "_user_num_feats",
            "_item_num_feats", "_feature_columns", "_first_ds",
        ):
            if hasattr(self, attr):
                state[attr] = getattr(self, attr)
        return state

    # ----------------------------------------------------------- features
    def _log_stats(self, interactions: pd.DataFrame) -> dict:
        """Per-user/per-item activity statistics (reference
        two_stages_scenario.py:236 statistical features)."""
        agg_u = {"u_count": (self.item_column, "count")}
        agg_i = {"i_count": (self.query_column, "count")}
        if self.rating_column in interactions.columns:
            agg_u["u_mean_rel"] = (self.rating_column, "mean")
            agg_i["i_mean_rel"] = (self.rating_column, "mean")
        user_stats = interactions.groupby(self.query_column).agg(**agg_u)
        item_stats = interactions.groupby(self.item_column).agg(**agg_i)
        return {"user": user_stats, "item": item_stats}

    def _numeric_entity_features(self, frame: Optional[pd.DataFrame], id_column):
        if frame is None:
            return None
        from pandas.api.types import is_numeric_dtype

        num_cols = [
            c for c in frame.columns if c != id_column and is_numeric_dtype(frame[c])
        ]
        if not num_cols:
            return None
        return frame.drop_duplicates(id_column).set_index(id_column)[num_cols]

    def _feature_frame(self, candidates: pd.DataFrame) -> pd.DataFrame:
        frame = candidates.join(self._stats["user"], on=self.query_column).join(
            self._stats["item"], on=self.item_column
        )
        score_cols = sorted(c for c in frame.columns if c.startswith("score_"))
        # per-user rank of each first-level score (reference adds rank cols)
        for c in score_cols:
            frame[f"rank_{c}"] = frame.groupby(self.query_column)[c].rank(
                ascending=False, method="first"
            )
        parts = [frame.drop(columns=[self.query_column, self.item_column])]
        if self._user_num_feats is not None:
            parts.append(
                self._user_num_feats.reindex(
                    candidates[self.query_column]
                ).set_axis(candidates.index).add_prefix("u_")
            )
        if self._item_num_feats is not None:
            parts.append(
                self._item_num_feats.reindex(
                    candidates[self.item_column]
                ).set_axis(candidates.index).add_prefix("i_")
            )
        for idx, (model, use_feat) in enumerate(
            zip(self.first_level_models, self.use_first_level_models_feat)
        ):
            if use_feat:
                parts.append(
                    get_first_level_model_features(
                        model, candidates, self.query_column, self.item_column,
                        prefix=f"m{idx}",
                    )
                )
        if self.use_generated_features and self.features_processor is not None:
            gen = self.features_processor.transform(
                candidates[[self.query_column, self.item_column]]
            )
            gen = gen.drop(
                columns=[self.query_column, self.item_column], errors="ignore"
            ).select_dtypes(include=[np.number])
            parts.append(gen.set_axis(candidates.index))
        out = pd.concat(parts, axis=1).fillna(0.0)
        return out.select_dtypes(include=[np.number])

    # ---------------------------------------------------------------- fit
    def _candidates(self, dataset: Dataset, queries, k: int) -> pd.DataFrame:
        """Union of per-model top-k candidates with per-model score
        columns; short users are topped up from the fallback model
        (reference _get_first_level_candidates :446)."""
        merged: Optional[pd.DataFrame] = None
        for idx, model in enumerate(self.first_level_models):
            recs = model._predict_wrap(
                dataset, k=k, queries=queries, filter_seen_items=True
            )
            recs = recs.rename(columns={self.rating_column: f"score_{idx}"})
            merged = (
                recs
                if merged is None
                else merged.merge(
                    recs, on=[self.query_column, self.item_column], how="outer"
                )
            )
        if self.fallback_model is not None:
            fb = self.fallback_model._predict_wrap(
                dataset, k=k, queries=queries, filter_seen_items=True
            )
            fb = fb.rename(columns={self.rating_column: "score_fallback"})
            extra = fb.merge(
                merged[[self.query_column, self.item_column]].assign(_hit=1),
                on=[self.query_column, self.item_column],
                how="left",
            )
            extra = extra[extra["_hit"].isna()].drop(columns="_hit")
            counts = merged.groupby(self.query_column).size()
            short = counts[counts < k].index
            extra = extra[extra[self.query_column].isin(short)]
            if len(extra):
                merged = pd.concat([merged, extra], ignore_index=True)
        if "score_fallback" not in merged.columns:
            merged["score_fallback"] = 0.0
        return merged.fillna(merged.min(numeric_only=True))

    def _random_negatives(self, queries, seen_pairs, n_items_frame):
        """Uniform unseen (query, item) pairs (reference
        negatives_type='random' via RandomRec)."""
        rng = np.random.default_rng(self.seed)
        items = n_items_frame
        rows_q, rows_i = [], []
        for q in queries:
            draw = rng.choice(items, size=min(self.num_negatives * 2, len(items)),
                              replace=False)
            fresh = [i for i in draw if (q, i) not in seen_pairs][: self.num_negatives]
            rows_q.extend([q] * len(fresh))
            rows_i.extend(fresh)
        out = pd.DataFrame({self.query_column: rows_q, self.item_column: rows_i})
        return out

    def _split(self, interactions: pd.DataFrame):
        """Per-user 50/50 split (chronological when a timestamp exists)."""
        if self.train_splitter is not None:
            return self.train_splitter.split(interactions)
        sort_cols = [self.query_column]
        if self.timestamp_column in interactions.columns:
            sort_cols.append(self.timestamp_column)
        ordered = interactions.sort_values(sort_cols, kind="stable")
        rank = ordered.groupby(self.query_column).cumcount()
        counts = ordered.groupby(self.query_column)[self.query_column].transform("count")
        is_second = rank >= (counts // 2)
        return ordered[~is_second], ordered[is_second]

    def _fit(self, dataset: Dataset) -> None:
        first_train, second_train = self._split(dataset.interactions)
        first_ds = Dataset(
            dataset.feature_schema, first_train,
            query_features=dataset.query_features,
            item_features=dataset.item_features,
            check_consistency=False,
        )

        for model in self.first_level_models:
            model._fit_wrap(first_ds)
        if self.fallback_model is not None:
            self.fallback_model._fit_wrap(first_ds)
        self._stats = self._log_stats(first_train)
        self._user_num_feats = self._numeric_entity_features(
            dataset.query_features, self.query_column
        )
        self._item_num_feats = self._numeric_entity_features(
            dataset.item_features, self.item_column
        )
        if self.use_generated_features:
            if self.features_processor is None:
                self.features_processor = HistoryBasedFeaturesProcessor(
                    user_cat_features_list=self.user_cat_features_list,
                    item_cat_features_list=self.item_cat_features_list,
                    query_column=self.query_column,
                    item_column=self.item_column,
                    rating_column=self.rating_column,
                    timestamp_column=self.timestamp_column,
                )
            self.features_processor.fit(
                first_train,
                user_features=dataset.query_features,
                item_features=dataset.item_features,
            )

        queries = np.unique(second_train[self.query_column].to_numpy())
        candidates = self._candidates(first_ds, queries, self.k_first_level)
        positives = set(
            map(tuple, second_train[[self.query_column, self.item_column]].to_numpy())
        )
        if self.negatives_type == "random":
            seen = set(
                map(tuple, first_train[[self.query_column, self.item_column]].to_numpy())
            ) | positives
            negs = self._random_negatives(
                queries, seen, np.unique(first_train[self.item_column].to_numpy())
            )
            # score the random negatives with the first-level columns = 0
            for c in candidates.columns:
                if c.startswith("score_"):
                    negs[c] = 0.0
            pos_rows = candidates[
                [
                    (q, i) in positives
                    for q, i in candidates[[self.query_column, self.item_column]].to_numpy()
                ]
            ]
            candidates = pd.concat([pos_rows, negs], ignore_index=True).fillna(0.0)
        labels = np.fromiter(
            (
                (q, i) in positives
                for q, i in candidates[[self.query_column, self.item_column]].to_numpy()
            ),
            dtype=bool,
            count=len(candidates),
        )
        # balance: keep all positives + sampled negatives
        rng = np.random.default_rng(self.seed)
        neg_idx = np.flatnonzero(~labels)
        keep_neg = rng.permutation(neg_idx)[
            : min(len(neg_idx), self.num_negatives * max(labels.sum(), 1))
        ]
        keep = np.concatenate([np.flatnonzero(labels), keep_neg])
        # features (incl. per-user ranks) over the FULL candidate frame so
        # train rows see the same distribution predict will
        features = self._feature_frame(candidates).iloc[keep]
        self._feature_columns = list(features.columns)
        self.second_stage_model.fit(features, labels[keep])
        self._first_ds = first_ds

    # ------------------------------------------------------------- predict
    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        candidates = self._candidates(dataset, queries, self.k_first_level)
        if items is not None:
            candidates = candidates[candidates[self.item_column].isin(items)]
        features = self._feature_frame(candidates).reindex(
            columns=self._feature_columns, fill_value=0.0
        )
        scores = self.second_stage_model.predict(features)
        out = candidates[[self.query_column, self.item_column]].copy()
        out[self.rating_column] = scores
        if filter_seen_items and dataset is not None:
            seen = set(
                map(
                    tuple,
                    dataset.interactions[[self.query_column, self.item_column]].to_numpy(),
                )
            )
            mask = [
                (q, i) not in seen
                for q, i in out[[self.query_column, self.item_column]].to_numpy()
            ]
            out = out[mask]
        out = (
            out.sort_values(
                [self.query_column, self.rating_column, self.item_column],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby(self.query_column, sort=False)
            .head(k)
        )
        return out.reset_index(drop=True)

    def fit_predict(self, dataset: Dataset, k: int, **kwargs) -> pd.DataFrame:
        """Fit and return recommendations (reference :618)."""
        self.fit(dataset)
        return self.predict(dataset, k, **kwargs)

    def optimize_first_level(self, train: Dataset, test: Dataset, k: int = 10,
                             budget: int = 10):
        """Run each first-level model's ``optimize`` (reference :675)."""
        results = []
        for model in self.first_level_models:
            if hasattr(model, "optimize"):
                results.append(model.optimize(train, test, k=k, budget=budget))
            else:
                results.append(None)
        return results
