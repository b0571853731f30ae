"""Prediction callbacks and postprocessors.

TPU-native analogs of the reference's callback layer (reference:
replay/nn/lightning/callback/predictions_callback.py:29 TopItemsCallbackBase
+ Pandas/Torch variants, :277 HiddenStatesCallback; postprocessors
replay/nn/lightning/postprocessor/seen_items.py:8 SeenItemsFilter and
replay/models/nn/sequential/postprocessors/postprocessors.py:114
SampleItems).

Postprocessors are pure functions logits → logits applied before top-k;
callbacks accumulate per-batch top-k into host frames.
"""

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


# ---------------------------------------------------------------- postprocessors
class SeenItemsFilter:
    """Mask seen items to -inf (reference: seen_items.py:8).  Operates on
    full histories supplied per batch as a [B, n_items] bool mask."""

    def __call__(self, logits: jnp.ndarray, seen_mask: Optional[np.ndarray] = None):
        if seen_mask is None:
            return logits
        return jnp.where(jnp.asarray(seen_mask), -jnp.inf, logits)


class SampleItems:
    """Restrict scoring to ground-truth + sampled negatives (reference:
    postprocessors.py:114): everything outside the candidate set → -inf."""

    def __init__(self, candidates: np.ndarray, n_items: int):
        mask = np.ones(n_items, dtype=bool)
        mask[np.asarray(candidates)] = False
        self._blocked = jnp.asarray(mask)

    def __call__(self, logits: jnp.ndarray, seen_mask=None):
        return jnp.where(self._blocked[None, :], -jnp.inf, logits)


# -------------------------------------------------------------------- callbacks
class TopKPredictionsCallback:
    """Accumulate per-batch top-k into one recommendations frame (reference:
    PandasTopItemsCallback, predictions_callback.py:124)."""

    def __init__(
        self,
        k: int,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        postprocessors: Sequence = (),
        item_id_decoder=None,
    ):
        self.k = k
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self.postprocessors = list(postprocessors)
        self.item_id_decoder = item_id_decoder
        self._chunks: List[pd.DataFrame] = []

    def on_batch(
        self,
        query_ids: np.ndarray,
        logits: jnp.ndarray,
        seen_mask: Optional[np.ndarray] = None,
        row_mask: Optional[np.ndarray] = None,
    ) -> None:
        for post in self.postprocessors:
            logits = post(logits, seen_mask=seen_mask)
        vals, idx = jax.lax.top_k(logits, self.k)
        vals, idx = np.asarray(vals), np.asarray(idx)
        if row_mask is not None:
            keep = np.asarray(row_mask).astype(bool)
            query_ids, vals, idx = np.asarray(query_ids)[keep], vals[keep], idx[keep]
        items = idx.ravel()
        if self.item_id_decoder is not None:
            items = self.item_id_decoder(items)
        chunk = pd.DataFrame(
            {
                self.query_column: np.repeat(np.asarray(query_ids), self.k),
                self.item_column: items,
                self.rating_column: vals.ravel().astype(np.float64),
            }
        )
        self._chunks.append(chunk[np.isfinite(chunk[self.rating_column])])

    def get_result(self) -> pd.DataFrame:
        if not self._chunks:
            return pd.DataFrame(
                columns=[self.query_column, self.item_column, self.rating_column]
            )
        return pd.concat(self._chunks, ignore_index=True)


class QueryEmbeddingsCallback:
    """Collect per-query final hidden states (reference:
    QueryEmbeddingsPredictionCallback / HiddenStatesCallback :277)."""

    def __init__(self, query_column: str = "query_id"):
        self.query_column = query_column
        self._ids: List[np.ndarray] = []
        self._embs: List[np.ndarray] = []

    def on_batch(self, query_ids, embeddings, row_mask=None) -> None:
        ids = np.asarray(query_ids)
        embs = np.asarray(embeddings)
        if row_mask is not None:
            keep = np.asarray(row_mask).astype(bool)
            ids, embs = ids[keep], embs[keep]
        self._ids.append(ids)
        self._embs.append(embs)

    def get_result(self):
        return np.concatenate(self._ids), np.concatenate(self._embs)
