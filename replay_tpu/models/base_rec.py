"""Recommender base hierarchy.

TPU-native rework of the reference base classes (reference:
replay/models/base_rec.py:52,86,692,795,926,1052,1143).  The reference builds
recommendations as lazy Spark DAGs with window-sort top-k and a post-hoc
filter-seen join; here every scoring model computes dense score blocks on
device (JAX) with seen-items masked to -inf *inside* the top-k kernel
(replay_tpu/ops/scoring.py), which preserves the reference's "k recs after
exclusion, ties by item asc" semantics in one pass.
"""

import json
import logging
import pickle
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Union

import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.optimization.search import OptimizeMixin
from replay_tpu.ops.scoring import topk_blockwise


def get_unique_entities(data, column: str) -> np.ndarray:
    """Normalize queries/items input (frame | series | iterable) to sorted unique ids."""
    if data is None:
        return None
    if isinstance(data, pd.DataFrame):
        values = data[column].to_numpy()
    elif isinstance(data, pd.Series):
        values = data.to_numpy()
    elif isinstance(data, np.ndarray):
        values = data
    elif isinstance(data, Iterable):
        values = np.asarray(list(data))
    else:
        msg = f"Unsupported type for {column}: {type(data)}"
        raise ValueError(msg)
    return np.unique(values)


class RecommenderCommons:
    """Shared logging / parameter plumbing (reference: replay/models/common.py:8)."""

    query_column: str = "query_id"
    item_column: str = "item_id"
    rating_column: str = "rating"
    timestamp_column: str = "timestamp"

    _logger: Optional[logging.Logger] = None

    @property
    def logger(self) -> logging.Logger:
        if self._logger is None:
            self._logger = logging.getLogger("replay_tpu")
        return self._logger

    def set_params(self, **params: Any) -> None:
        """Set model hyperparameters by name."""
        for param, value in params.items():
            setattr(self, param, value)
        self._clear_cache()

    def _clear_cache(self):
        """Hook for dropping cached state when params change."""

    def __str__(self):
        return type(self).__name__


class IsSavable(ABC):
    """Save/load contract (reference: replay/models/base_rec.py:52)."""

    @property
    @abstractmethod
    def _init_args(self) -> Dict:
        """Constructor arguments to persist."""

    @property
    def _dataframes(self) -> Dict:
        """Named dataframes to persist."""
        return {}

    def _save_model(self, path: str, additional_params: Optional[Dict] = None):
        saved = {"_init_args": True}
        if additional_params:
            (Path(path) / "additional_params.json").write_text(json.dumps(additional_params))
        return saved

    def _load_model(self, path: str):
        extra = Path(path) / "additional_params.json"
        if extra.exists():
            for key, value in json.loads(extra.read_text()).items():
                setattr(self, key, value)


class BaseRecommender(RecommenderCommons, IsSavable, OptimizeMixin, ABC):
    """Root of the recommender hierarchy."""

    can_predict_cold_queries: bool = False
    can_predict_cold_items: bool = False

    fit_queries: np.ndarray
    fit_items: np.ndarray
    _num_queries: int
    _num_items: int

    # ---------------------------------------------------------------- fitting
    def _fit_wrap(self, dataset: Dataset) -> None:
        self.query_column = dataset.feature_schema.query_id_column
        self.item_column = dataset.feature_schema.item_id_column
        self.rating_column = dataset.feature_schema.interactions_rating_column or "rating"
        self.timestamp_column = dataset.feature_schema.interactions_timestamp_column or "timestamp"

        self.fit_queries = np.unique(dataset.interactions[self.query_column].to_numpy())
        self.fit_items = np.unique(dataset.interactions[self.item_column].to_numpy())
        if dataset.query_features is not None and self.query_column in dataset.query_features:
            self.fit_queries = np.unique(
                np.concatenate(
                    [self.fit_queries, dataset.query_features[self.query_column].to_numpy()]
                )
            )
        if dataset.item_features is not None and self.item_column in dataset.item_features:
            self.fit_items = np.unique(
                np.concatenate(
                    [self.fit_items, dataset.item_features[self.item_column].to_numpy()]
                )
            )
        self._num_queries = len(self.fit_queries)
        self._num_items = len(self.fit_items)
        self._query_dim_size = int(self.fit_queries.max()) + 1 if self._num_queries else 0
        self._item_dim_size = int(self.fit_items.max()) + 1 if self._num_items else 0
        self._fit(dataset)

    @abstractmethod
    def _fit(self, dataset: Dataset) -> None: ...

    @property
    def queries_count(self) -> int:
        return self._num_queries

    @property
    def items_count(self) -> int:
        return self._num_items

    # ------------------------------------------------------------- prediction
    def _filter_cold_for_predict(
        self, entities: np.ndarray, entity: str
    ) -> np.ndarray:
        can_cold = (
            self.can_predict_cold_queries if entity == "query" else self.can_predict_cold_items
        )
        if can_cold:
            return entities
        fit_entities = self.fit_queries if entity == "query" else self.fit_items
        mask = np.isin(entities, fit_entities)
        if not mask.all():
            self.logger.info(
                "%s model can't predict cold %ss, they will be ignored", self, entity
            )
        return entities[mask]

    def _resolve_queries_items(
        self,
        dataset: Optional[Dataset],
        queries,
        items,
    ):
        if queries is not None:
            queries = get_unique_entities(queries, self.query_column)
        elif dataset is not None:
            queries = np.unique(dataset.interactions[self.query_column].to_numpy())
        else:
            queries = self.fit_queries
        queries = self._filter_cold_for_predict(queries, "query")

        if items is not None:
            items = get_unique_entities(items, self.item_column)
        else:
            items = self.fit_items
        items = self._filter_cold_for_predict(items, "item")
        return queries, items

    def _seen_csr(
        self, dataset: Optional[Dataset], queries: np.ndarray, items: np.ndarray
    ) -> Optional[csr_matrix]:
        """CSR [len(queries), len(items)] of seen pairs from dataset interactions."""
        if dataset is None or len(queries) == 0 or len(items) == 0:
            return None
        inter = dataset.interactions
        q = inter[self.query_column].to_numpy()
        i = inter[self.item_column].to_numpy()
        q_pos = np.searchsorted(queries, q)
        valid_q = (q_pos < len(queries)) & (queries[np.minimum(q_pos, len(queries) - 1)] == q)
        i_pos = np.searchsorted(items, i)
        valid_i = (i_pos < len(items)) & (items[np.minimum(i_pos, len(items) - 1)] == i)
        keep = valid_q & valid_i
        return csr_matrix(
            (np.ones(int(keep.sum()), dtype=np.int8), (q_pos[keep], i_pos[keep])),
            shape=(len(queries), len(items)),
        )

    def _predict_by_scores(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: np.ndarray,
        items: np.ndarray,
        filter_seen_items: bool,
        block_size: int = 2048,
    ) -> pd.DataFrame:
        """Blocked device scoring + fused masked top-k → recs frame."""
        if len(queries) == 0 or len(items) == 0:
            return pd.DataFrame(
                {self.query_column: [], self.item_column: [], self.rating_column: []}
            )
        seen = self._seen_csr(dataset, queries, items) if filter_seen_items else None

        def score_fn(start, rows):
            return self._score_block(queries[start : start + rows], items, dataset)

        vals, idx = topk_blockwise(
            score_fn,
            n_queries=len(queries),
            n_items=len(items),
            k=k,
            block_size=block_size,
            seen_csr=seen,
        )
        k_eff = vals.shape[1]
        recs = pd.DataFrame(
            {
                self.query_column: np.repeat(queries, k_eff),
                self.item_column: items[idx.ravel()],
                self.rating_column: vals.ravel().astype(np.float64),
            }
        )
        # drop masked -inf fillers (fewer than k unseen candidates)
        return recs[np.isfinite(recs[self.rating_column])]

    def _score_block(
        self, query_ids: np.ndarray, item_ids: np.ndarray, dataset: Optional[Dataset] = None
    ) -> np.ndarray:
        """Scores [len(query_ids), len(item_ids)]; override in scoring models."""
        raise NotImplementedError

    def _predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: np.ndarray,
        items: np.ndarray,
        filter_seen_items: bool = True,
    ) -> pd.DataFrame:
        """Default prediction via blocked scoring; models may override."""
        return self._predict_by_scores(dataset, k, queries, items, filter_seen_items)

    def _check_fitted(self) -> None:
        """Clear failure mode for predict-before-fit (the reference surfaces
        an AttributeError from missing fit state; here it is explicit)."""
        if getattr(self, "fit_queries", None) is None:
            msg = f"{self!s} is not fitted: call fit() before predict()"
            raise ValueError(msg)

    def _predict_wrap(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries=None,
        items=None,
        filter_seen_items: bool = True,
        recs_file_path: Optional[str] = None,
    ) -> Optional[pd.DataFrame]:
        self._check_fitted()
        queries, items = self._resolve_queries_items(dataset, queries, items)
        if len(items) < k:
            self.logger.debug("k = %s > number of items = %s", k, len(items))
        recs = self._predict(dataset, k, queries, items, filter_seen_items)
        recs = recs[[self.query_column, self.item_column, self.rating_column]].reset_index(
            drop=True
        )
        if recs_file_path is not None:
            recs.to_parquet(recs_file_path)
            return None
        return recs

    def _predict_proba(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries=None,
        items=None,
        filter_seen_items: bool = True,
    ) -> np.ndarray:
        """Action distribution over items per query, shape
        ``(n_queries, n_items, k)``: probability 1 on the item recommended
        at each of the top-k positions (reference:
        replay/models/base_rec.py:371 — used by the OBP offline-bandit
        wrapper)."""
        queries, items = self._resolve_queries_items(dataset, queries, items)
        n_queries, n_items = len(queries), len(items)
        recs = self._predict(dataset, k, queries, items, filter_seen_items)
        recs = (
            recs.sort_values(
                [self.query_column, self.rating_column, self.item_column],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby(self.query_column, sort=False)
            .head(k)
        )
        action_dist = np.zeros((n_queries, n_items, k))
        q_pos = np.searchsorted(queries, recs[self.query_column].to_numpy())
        i_pos = np.searchsorted(items, recs[self.item_column].to_numpy())
        slot = recs.groupby(self.query_column).cumcount().to_numpy()
        action_dist[q_pos, i_pos, slot] = 1.0
        return action_dist

    # -------------------------------------------------------------- pairs
    def _predict_pairs_wrap(
        self,
        pairs: pd.DataFrame,
        dataset: Optional[Dataset] = None,
        recs_file_path: Optional[str] = None,
        k: Optional[int] = None,
    ) -> Optional[pd.DataFrame]:
        self._check_fitted()
        if set([self.query_column, self.item_column]) - set(pairs.columns):
            msg = "pairs must contain query and item id columns"
            raise ValueError(msg)
        pred = self._predict_pairs(pairs, dataset)
        if k is not None:
            pred = (
                pred.sort_values(
                    [self.query_column, self.rating_column],
                    ascending=[True, False],
                    kind="stable",
                )
                .groupby(self.query_column, sort=False)
                .head(k)
            )
        if recs_file_path is not None:
            pred.to_parquet(recs_file_path)
            return None
        return pred.reset_index(drop=True)

    def _predict_pairs(
        self, pairs: pd.DataFrame, dataset: Optional[Dataset] = None
    ) -> pd.DataFrame:
        """Score explicit (query, item) pairs via the scoring kernel."""
        queries = np.unique(pairs[self.query_column].to_numpy())
        out = []
        for start in range(0, len(queries), 2048):
            q_block = queries[start : start + 2048]
            block_pairs = pairs[pairs[self.query_column].isin(q_block)]
            items = np.unique(block_pairs[self.item_column].to_numpy())
            scores = np.asarray(self._score_block(q_block, items, dataset))
            q_pos = np.searchsorted(q_block, block_pairs[self.query_column].to_numpy())
            i_pos = np.searchsorted(items, block_pairs[self.item_column].to_numpy())
            out.append(
                pd.DataFrame(
                    {
                        self.query_column: block_pairs[self.query_column].to_numpy(),
                        self.item_column: block_pairs[self.item_column].to_numpy(),
                        self.rating_column: scores[q_pos, i_pos].astype(np.float64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    # -------------------------------------------------------------- save/load
    @property
    def _dataframes(self) -> Dict:
        return {}

    def save(self, path: str) -> None:
        """Persist the fitted model as a directory."""
        base = Path(path).resolve()
        base.mkdir(parents=True, exist_ok=True)
        meta = {
            "_class_name": type(self).__name__,
            "init_args": self._init_args,
            "columns": {
                "query_column": self.query_column,
                "item_column": self.item_column,
                "rating_column": self.rating_column,
                "timestamp_column": self.timestamp_column,
            },
        }
        (base / "init_args.json").write_text(json.dumps(meta, default=str))
        state = {
            "fit_queries": getattr(self, "fit_queries", None),
            "fit_items": getattr(self, "fit_items", None),
        }
        for name, frame in self._dataframes.items():
            state[f"df_{name}"] = frame
        extra = self._get_save_state()
        state.update({f"extra_{k}": v for k, v in extra.items()})
        with open(base / "state.pkl", "wb") as fh:
            pickle.dump(state, fh)

    def _get_save_state(self) -> Dict:
        """Extra fitted state to persist (arrays etc.); override as needed."""
        return {}

    def _set_save_state(self, state: Dict) -> None:
        for key, value in state.items():
            setattr(self, key, value)

    @classmethod
    def load(cls, path: str) -> "BaseRecommender":
        base = Path(path)
        meta = json.loads((base / "init_args.json").read_text())
        model = cls(**meta["init_args"])
        for col, value in meta["columns"].items():
            setattr(model, col, value)
        with open(base / "state.pkl", "rb") as fh:
            state = pickle.load(fh)
        model.fit_queries = state.pop("fit_queries")
        model.fit_items = state.pop("fit_items")
        if model.fit_queries is not None:
            model._num_queries = len(model.fit_queries)
            model._query_dim_size = (
                int(model.fit_queries.max()) + 1 if len(model.fit_queries) else 0
            )
        if model.fit_items is not None:
            model._num_items = len(model.fit_items)
            model._item_dim_size = int(model.fit_items.max()) + 1 if len(model.fit_items) else 0
        frames = {k[3:]: v for k, v in state.items() if k.startswith("df_")}
        for name, frame in frames.items():
            setattr(model, name, frame)
        extras = {k[6:]: v for k, v in state.items() if k.startswith("extra_")}
        model._set_save_state(extras)
        return model


class Recommender(BaseRecommender, ABC):
    """Personalized recommender trained on interactions
    (reference: replay/models/base_rec.py:926)."""

    def fit(self, dataset: Dataset) -> None:
        """Fit the model to the dataset."""
        self._fit_wrap(dataset)

    def predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries=None,
        items=None,
        filter_seen_items: bool = True,
        recs_file_path: Optional[str] = None,
    ) -> Optional[pd.DataFrame]:
        """Recommend top-k items per query."""
        return self._predict_wrap(dataset, k, queries, items, filter_seen_items, recs_file_path)

    def fit_predict(
        self,
        dataset: Dataset,
        k: int,
        queries=None,
        items=None,
        filter_seen_items: bool = True,
        recs_file_path: Optional[str] = None,
    ) -> Optional[pd.DataFrame]:
        """Fit then predict."""
        self.fit(dataset)
        return self.predict(dataset, k, queries, items, filter_seen_items, recs_file_path)

    def predict_pairs(
        self,
        pairs: pd.DataFrame,
        dataset: Optional[Dataset] = None,
        recs_file_path: Optional[str] = None,
        k: Optional[int] = None,
    ) -> Optional[pd.DataFrame]:
        """Score explicit (query, item) pairs."""
        return self._predict_pairs_wrap(pairs, dataset, recs_file_path, k)

    def get_features(self, ids, features=None):
        """Query/item embedding vectors for the given ids (reference:
        replay/models/base_rec.py:914,1041 get_features).

        :param ids: frame holding a ``query_column`` OR ``item_column``
            column of unique ids (entity inferred from the column name).
        :returns: ``(frame with a '{entity}_factors' list column, rank)``,
            or ``None`` when the model has no embeddings.
        """
        ids = pd.DataFrame(ids)
        if self.query_column not in ids.columns and self.item_column not in ids.columns:
            msg = f"{self.query_column} or {self.item_column} missing"
            raise ValueError(msg)
        return self._get_features(ids, features)

    def _get_features(self, ids: pd.DataFrame, features=None):
        self.logger.info(
            "%s does not have feature vectors. Return None", type(self).__name__
        )
        return None


class ItemVectorModel:
    """Mixin for models exposing item embedding vectors — nearest-item
    search via one device matmul + masked top-k (reference:
    replay/models/base_rec.py:692)."""

    def _get_item_vectors(self) -> np.ndarray:
        """[n_fit_items, dim] item vectors aligned with ``fit_items``."""
        raise NotImplementedError

    def get_nearest_items(
        self,
        items,
        k: int,
        metric: str = "cosine_similarity",
        candidates=None,
    ) -> pd.DataFrame:
        """k most similar items for each query item.

        :param metric: ``cosine_similarity`` | ``dot_product`` |
            ``euclidean_distance_sim`` (reference metric names).
        """
        items = get_unique_entities(items, self.item_column)
        cand = (
            get_unique_entities(candidates, self.item_column)
            if candidates is not None
            else self.fit_items
        )
        items = items[np.isin(items, self.fit_items)]
        cand = cand[np.isin(cand, self.fit_items)]
        vectors = self._get_item_vectors()
        a = vectors[np.searchsorted(self.fit_items, items)].astype(np.float32)
        b = vectors[np.searchsorted(self.fit_items, cand)].astype(np.float32)
        import jax.numpy as jnp

        av, bv = jnp.asarray(a), jnp.asarray(b)
        if metric == "cosine_similarity":
            av = av / jnp.maximum(jnp.linalg.norm(av, axis=1, keepdims=True), 1e-12)
            bv = bv / jnp.maximum(jnp.linalg.norm(bv, axis=1, keepdims=True), 1e-12)
            sim = jnp.dot(av, bv.T, preferred_element_type=jnp.float32)
        elif metric == "dot_product":
            sim = jnp.dot(av, bv.T, preferred_element_type=jnp.float32)
        elif metric == "euclidean_distance_sim":
            d2 = (
                jnp.sum(av**2, axis=1)[:, None]
                + jnp.sum(bv**2, axis=1)[None]
                - 2 * jnp.dot(av, bv.T, preferred_element_type=jnp.float32)
            )
            sim = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(d2, 0.0)))
        else:
            msg = f"Unknown metric {metric}"
            raise ValueError(msg)
        # exclude self-similarity
        self_mask = items[:, None] == cand[None, :]
        sim = np.array(sim)  # writable copy (device arrays are read-only views)
        sim[self_mask] = -np.inf
        k_eff = min(k, sim.shape[1])
        idx = np.argsort(-sim, axis=1, kind="stable")[:, :k_eff]
        vals = np.take_along_axis(sim, idx, axis=1)
        out = pd.DataFrame(
            {
                self.item_column: np.repeat(items, k_eff),
                "neighbour_item_idx": cand[idx.ravel()],
                "similarity": vals.ravel().astype(np.float64),
            }
        )
        return out[np.isfinite(out["similarity"])].reset_index(drop=True)


class HybridRecommender(Recommender, ABC):
    """Recommender that requires query/item features
    (reference: replay/models/base_rec.py:795)."""


class QueryRecommender(Recommender, ABC):
    """Recommender that requires query features only
    (reference: replay/models/base_rec.py:1052)."""

    def fit(self, dataset: Dataset) -> None:
        if dataset.query_features is None:
            msg = f"{self} requires query features"
            raise ValueError(msg)
        super().fit(dataset)


class NonPersonalizedRecommender(Recommender, ABC):
    """Popularity-statistics recommender
    (reference: replay/models/base_rec.py:1143)."""

    can_predict_cold_queries = True
    can_predict_cold_items = True

    item_popularity: pd.DataFrame
    fill: float

    def __init__(self, add_cold_items: bool = True, cold_weight: float = 0.5):
        if not 0 < cold_weight <= 1:
            msg = "`cold_weight` value should be in interval (0, 1]"
            raise ValueError(msg)
        self.add_cold_items = add_cold_items
        self.cold_weight = cold_weight

    @property
    def _dataframes(self):
        return {"item_popularity": self.item_popularity}

    def _get_save_state(self):
        return {"fill": getattr(self, "fill", 0.0)}

    @staticmethod
    def _calc_fill(item_popularity: pd.DataFrame, weight: float, rating_column: str) -> float:
        return float(item_popularity[rating_column].min()) * weight

    @staticmethod
    def _check_rating(dataset: Dataset):
        rating_column = dataset.feature_schema.interactions_rating_column
        vals = dataset.interactions[rating_column]
        if ((vals != 0) & (vals != 1)).any():
            msg = "Rating values in interactions must be 0 or 1"
            raise ValueError(msg)

    def _popularity_vector(self, items: np.ndarray) -> np.ndarray:
        """Popularity aligned to ``items``; cold items get the fill value."""
        pop = self.item_popularity.set_index(self.item_column)[self.rating_column]
        vec = pop.reindex(items)
        if self.add_cold_items:
            vec = vec.fillna(self.fill)
        else:
            vec = vec.fillna(-np.inf)
        return vec.to_numpy(dtype=np.float32)

    def _resolve_queries_items(self, dataset, queries, items):
        queries, items = super()._resolve_queries_items(dataset, queries, items)
        if not self.add_cold_items:
            items = items[np.isin(items, self.fit_items)]
        return queries, items

    def get_items_pd(self, items) -> pd.DataFrame:
        """Normalized popularities (probabilities) of the given items
        (reference: replay/models/base_rec.py:1259 get_items_pd): zero
        popularity is replaced with 1e-6 before normalization; cold items
        get the fill value when ``add_cold_items`` (else dropped)."""
        if isinstance(items, pd.DataFrame):
            item_ids = items[self.item_column].to_numpy()
        else:
            item_ids = np.asarray(items)
        if not self.add_cold_items:
            item_ids = item_ids[np.isin(item_ids, self.fit_items)]
        pop = self._popularity_vector(item_ids).astype(np.float64)
        pop = np.where(pop == 0.0, 1e-6, pop)
        return pd.DataFrame(
            {
                self.item_column: item_ids,
                self.rating_column: pop,
                "probability": pop / pop.sum(),
            }
        )

    def _score_block(
        self, query_ids: np.ndarray, item_ids: np.ndarray, dataset: Optional[Dataset] = None
    ) -> np.ndarray:
        pop = self._popularity_vector(item_ids)
        return np.broadcast_to(pop, (len(query_ids), len(item_ids)))

    # -- sampling strategy (sample=True) -----------------------------------------
    def _predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: np.ndarray,
        items: np.ndarray,
        filter_seen_items: bool = True,
    ) -> pd.DataFrame:
        if getattr(self, "sample", False):
            return self._predict_with_sampling(dataset, k, queries, items, filter_seen_items)
        return self._predict_by_scores(dataset, k, queries, items, filter_seen_items)

    def _predict_with_sampling(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: np.ndarray,
        items: np.ndarray,
        filter_seen_items: bool = True,
    ) -> pd.DataFrame:
        """Sample k items per query without replacement, with probability
        proportional to item popularity, via the Gumbel-top-k trick on device
        (equivalent to the reference's per-user numpy.choice pandas_udf,
        reference: replay/models/base_rec.py:1283, but one fused kernel)."""
        import jax

        pop = self._popularity_vector(items).astype(np.float64)
        pop = np.where(np.isfinite(pop), pop, 0.0)
        total = pop.sum()
        probs = pop / total if total > 0 else np.full_like(pop, 1.0 / max(len(pop), 1))
        log_p = np.where(probs > 0, np.log(np.maximum(probs, 1e-300)), -np.inf).astype(
            np.float32
        )
        seed = getattr(self, "seed", None)
        key = jax.random.PRNGKey(seed if seed is not None else np.random.randint(0, 2**31 - 1))
        seen = self._seen_csr(dataset, queries, items) if filter_seen_items else None

        from replay_tpu.ops.scoring import topk_blockwise

        log_p_dev = None

        def score_fn(start, rows):
            import jax.numpy as jnp

            nonlocal log_p_dev
            if log_p_dev is None:
                log_p_dev = jnp.asarray(log_p)
            block_key = jax.random.fold_in(key, start)
            gumbel = jax.random.gumbel(block_key, (rows, len(items)), dtype=jnp.float32)
            return log_p_dev[None, :] + gumbel

        _, idx = topk_blockwise(
            score_fn,
            n_queries=len(queries),
            n_items=len(items),
            k=k,
            seen_csr=seen,
        )
        k_eff = idx.shape[1]
        ratings = probs[idx.ravel()]
        recs = pd.DataFrame(
            {
                self.query_column: np.repeat(queries, k_eff),
                self.item_column: items[idx.ravel()],
                self.rating_column: ratings.astype(np.float64),
            }
        )
        return recs[recs[self.rating_column] > 0]
