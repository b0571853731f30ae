"""LightFMWrap: wrapper over the ``lightfm`` library (optional dependency).

TPU-native analog of the reference (reference:
replay/experimental/models/lightfm_wrap.py:19).  ``lightfm`` is a
C-extension package that must be installed manually; this module imports
lazily and raises a clear error when absent — the reference's conditional
import contract (replay/experimental/models/__init__.py:34-50).

The feature plumbing matches the reference's ``_feature_table_to_csr``
(:64): the per-entity sparse matrix is [one-hot identity over fit-time
entities | MinMaxScaler-scaled numeric features], row-normalized to sum 1,
which is what lets LightFM score COLD users/items purely from their
features (``can_predict_cold_*`` flips on when features are supplied).
That construction is pure scipy/sklearn and is unit-tested without
lightfm installed (tests/experimental/test_lightfm_features.py).
"""

import os
from importlib.util import find_spec
from typing import Optional, Tuple

import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix, diags, hstack

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

LIGHTFM_AVAILABLE = find_spec("lightfm") is not None


class LightFMWrap(Recommender):
    """Hybrid matrix factorization via lightfm (requires `pip install lightfm`)."""

    epochs: int = 10
    _search_space = {
        "loss": {
            "type": "categorical",
            "args": ["logistic", "bpr", "warp", "warp-kos"],
        },
        "no_components": {"type": "loguniform_int", "args": [8, 512]},
    }

    def __init__(
        self,
        no_components: int = 128,
        loss: str = "warp",
        random_state: Optional[int] = None,
        epochs: Optional[int] = None,
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
        if epochs is not None:
            self.epochs = epochs
        cpu_count = os.cpu_count()
        self.num_threads = cpu_count if cpu_count is not None else 1
        self.model = None
        self.user_feat_scaler = None
        self.item_feat_scaler = None

    @property
    def _init_args(self):
        return {
            "no_components": self.no_components,
            "loss": self.loss,
            "random_state": self.random_state,
            # replay_tpu extension (the reference has no epochs ctor param);
            # persisted so save/load keeps the configured training length
            "epochs": self.epochs,
        }

    def _get_save_state(self):
        return {
            "model": self.model,
            "user_feat_scaler": self.user_feat_scaler,
            "item_feat_scaler": self.item_feat_scaler,
        }

    # -- feature matrices --------------------------------------------------
    def _feature_table_to_csr(
        self,
        entity: str,
        ids: np.ndarray,
        feature_table: Optional[pd.DataFrame],
    ) -> Optional[csr_matrix]:
        """[one-hot fit-entity identity | scaled features], row-normalized.

        ``ids`` order defines the matrix rows (LightFM's user_ids/item_ids
        index into these rows at predict).  Mirrors the reference
        ``_feature_table_to_csr`` (lightfm_wrap.py:64): the MinMaxScaler is
        fit once (at fit time) per entity and reused for predict calls.
        """
        if feature_table is None:
            return None
        fit_ids = self.fit_queries if entity == "user" else self.fit_items
        id_col = self.query_column if entity == "user" else self.item_column
        fit_dim = len(fit_ids)
        n_rows = len(ids)

        feature_cols = sorted(c for c in feature_table.columns if c != id_col)
        for col in feature_cols:
            if not pd.api.types.is_numeric_dtype(feature_table[col]):
                msg = f"feature column {col} must be numeric"
                raise ValueError(msg)

        # identity block: rows of entities seen at fit get their fit column
        positions = np.searchsorted(fit_ids, ids)
        positions = np.clip(positions, 0, fit_dim - 1)
        warm = np.zeros(n_rows, dtype=bool)
        if fit_dim:
            warm = fit_ids[positions] == ids
        rows = np.arange(n_rows)[warm]
        entity_id_features = csr_matrix(
            (np.ones(len(rows)), (rows, positions[warm])), shape=(n_rows, fit_dim)
        )

        merged = pd.DataFrame({id_col: ids}).merge(feature_table, on=id_col, how="left")
        features_np = merged[feature_cols].to_numpy(dtype=np.float64)
        have_feats = ~np.isnan(features_np).any(axis=1)
        n_feats = len(feature_cols)

        scaler_name = f"{entity}_feat_scaler"
        if getattr(self, scaler_name) is None:
            from sklearn.preprocessing import MinMaxScaler

            if not have_feats.any():
                msg = f"features for {entity}s from log are absent"
                raise ValueError(msg)
            setattr(self, scaler_name, MinMaxScaler().fit(features_np[have_feats]))

        if have_feats.any() and n_feats:
            scaled = getattr(self, scaler_name).transform(
                np.nan_to_num(features_np, nan=0.0)
            )
            scaled[~have_feats] = 0.0
            r = np.repeat(np.arange(n_rows)[have_feats], n_feats)
            c = np.tile(np.arange(n_feats), int(have_feats.sum()))
            sparse_features = csr_matrix(
                (scaled[have_feats].ravel(), (r, c)), shape=(n_rows, n_feats)
            )
        else:
            sparse_features = csr_matrix((n_rows, n_feats))

        concat = hstack([entity_id_features, sparse_features]).tocsr()
        row_sum = np.asarray(concat.sum(axis=1)).ravel()
        mask = row_sum != 0.0
        inv = np.zeros_like(row_sum)
        inv[mask] = 1.0 / row_sum[mask]
        return diags(inv, format="csr") @ concat

    # -- fit / predict -------------------------------------------------------
    def _fit(self, dataset: Dataset) -> None:
        from lightfm import LightFM

        self.user_feat_scaler = None
        self.item_feat_scaler = None

        inter = dataset.interactions
        q = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy())
        i = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy())
        r = (
            inter[self.rating_column].to_numpy(dtype=np.float64)
            if self.rating_column in inter.columns
            else np.ones(len(inter), dtype=np.float64)
        )
        mat = csr_matrix(
            (r, (q, i)), shape=(len(self.fit_queries), len(self.fit_items))
        )
        csr_user = self._feature_table_to_csr(
            "user", np.asarray(self.fit_queries), dataset.query_features
        )
        csr_item = self._feature_table_to_csr(
            "item", np.asarray(self.fit_items), dataset.item_features
        )
        if dataset.query_features is not None:
            self.can_predict_cold_queries = True
        if dataset.item_features is not None:
            self.can_predict_cold_items = True

        self.model = LightFM(
            loss=self.loss,
            no_components=self.no_components,
            random_state=self.random_state,
        ).fit(
            interactions=mat,
            epochs=self.epochs,
            num_threads=self.num_threads,
            user_features=csr_user,
            item_features=csr_item,
        )

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if self.can_predict_cold_queries and (
            dataset is None or dataset.query_features is None
        ):
            msg = "User features are missing for predict"
            raise ValueError(msg)
        if self.can_predict_cold_items and (
            dataset is None or dataset.item_features is None
        ):
            msg = "Item features are missing for predict"
            raise ValueError(msg)
        query_ids = np.asarray(query_ids)
        item_ids = np.asarray(item_ids)
        csr_user = csr_item = None
        # only build feature CSRs when the model was FIT with that side's
        # features (can_predict_cold_*) — otherwise LightFM fails on a
        # feature-matrix width mismatch with an opaque error, so predict-time
        # features on a featureless fit are ignored
        if self.can_predict_cold_queries and dataset is not None and dataset.query_features is not None:
            csr_user = self._feature_table_to_csr("user", query_ids, dataset.query_features)
        if self.can_predict_cold_items and dataset is not None and dataset.item_features is not None:
            csr_item = self._feature_table_to_csr("item", item_ids, dataset.item_features)
        if csr_user is None:
            u_idx = np.searchsorted(self.fit_queries, query_ids)
        else:
            u_idx = np.arange(len(query_ids))
        if csr_item is None:
            i_idx = np.searchsorted(self.fit_items, item_ids)
        else:
            i_idx = np.arange(len(item_ids))
        users = np.repeat(u_idx, len(i_idx)).astype(np.int32)
        items = np.tile(i_idx, len(u_idx)).astype(np.int32)
        scores = self.model.predict(
            user_ids=users,
            item_ids=items,
            user_features=csr_user,
            item_features=csr_item,
            num_threads=self.num_threads,
        )
        return scores.reshape(len(query_ids), len(item_ids))

    # -- representation export (reference _get_features :256) ---------------
    def get_features(
        self, ids: np.ndarray, entity: str, features: Optional[pd.DataFrame] = None
    ) -> Tuple[pd.DataFrame, int]:
        """Biases + latent factors for users/items as a pandas frame.

        :param ids: entity ids to export
        :param entity: "user" or "item"
        :param features: optional feature frame (required for cold ids when
            the model was trained with features)
        :return: (frame with ``{entity}_bias``/``{entity}_factors``, dim)
        """
        ids = np.asarray(ids)
        if features is None:
            fit_ids = self.fit_queries if entity == "user" else self.fit_items
            positions = np.clip(np.searchsorted(fit_ids, ids), 0, len(fit_ids) - 1)
            warm = fit_ids[positions] == ids
            rows = np.arange(len(ids))[warm]
            sparse_features = csr_matrix(
                (np.ones(len(rows)), (rows, positions[warm])),
                shape=(len(ids), len(fit_ids)),
            )
        else:
            sparse_features = self._feature_table_to_csr(entity, ids, features)
        biases, vectors = getattr(self.model, f"get_{entity}_representations")(
            sparse_features
        )
        id_col = self.query_column if entity == "user" else self.item_column
        frame = pd.DataFrame(
            {
                id_col: ids,
                f"{entity}_bias": biases[: len(ids)].tolist(),
                f"{entity}_factors": vectors[: len(ids)].tolist(),
            }
        )
        return frame, self.model.no_components
