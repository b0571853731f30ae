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

from typing import Dict, List, Optional, Protocol, Sequence

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
    """Accumulate per-batch top-k into a recommendations result (reference:
    TopItemsCallbackBase + Pandas/Polars/Spark/Torch variants,
    predictions_callback.py:124-237).

    :param output_format: ``pandas`` (default) — one concatenated frame;
        ``polars`` — a polars frame (requires polars installed); ``arrays``
        — dict of numpy arrays (the torch-variant analog); ``parquet`` —
        chunks stream straight to ``output_path`` and ``get_result`` returns
        that path (the Spark-variant analog for at-scale outputs).
    """

    def __init__(
        self,
        k: int,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        postprocessors: Sequence = (),
        item_id_decoder=None,
        output_format: str = "pandas",
        output_path: Optional[str] = None,
    ):
        if output_format not in ("pandas", "polars", "arrays", "parquet"):
            msg = f"Unknown output_format {output_format}"
            raise ValueError(msg)
        if output_format == "polars":
            from replay_tpu.utils.types import POLARS_AVAILABLE

            if not POLARS_AVAILABLE:
                msg = "output_format='polars' requires polars to be installed"
                raise ImportError(msg)
        if output_format == "parquet" and not output_path:
            msg = "output_format='parquet' requires output_path"
            raise ValueError(msg)
        self.k = k
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self.postprocessors = list(postprocessors)
        self.item_id_decoder = item_id_decoder
        self.output_format = output_format
        self.output_path = output_path
        self._chunks: List[Dict[str, np.ndarray]] = []
        self._writer = None

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
            items = np.asarray(self.item_id_decoder(items))
        ratings = vals.ravel().astype(np.float64)
        finite = np.isfinite(ratings)
        chunk = {
            self.query_column: np.repeat(np.asarray(query_ids), self.k)[finite],
            self.item_column: items[finite],
            self.rating_column: ratings[finite],
        }
        if self.output_format == "parquet":
            self._write_parquet(chunk)
        else:
            self._chunks.append(chunk)

    def _write_parquet(self, chunk: Dict[str, np.ndarray]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table({k: pa.array(v) for k, v in chunk.items()})
        if self._writer is None:
            self._writer = pq.ParquetWriter(self.output_path, table.schema)
        self._writer.write_table(table)

    def _arrays(self) -> Dict[str, np.ndarray]:
        cols = [self.query_column, self.item_column, self.rating_column]
        if not self._chunks:
            return {c: np.array([]) for c in cols}
        return {c: np.concatenate([ch[c] for ch in self._chunks]) for c in cols}

    def get_result(self):
        if self.output_format == "parquet":
            if self._writer is not None:
                self._writer.close()
                self._writer = None
            return self.output_path
        arrays = self._arrays()
        if self.output_format == "arrays":
            return arrays
        if self.output_format == "polars":
            import polars as pl

            return pl.DataFrame(arrays)
        return pd.DataFrame(arrays)


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


def _format_preset(fmt):
    class _Preset(TopKPredictionsCallback):
        def __init__(self, k, query_column="query_id", item_column="item_id",
                     rating_column="rating", postprocessors=(),
                     item_id_decoder=None, output_path=None):
            super().__init__(
                k, query_column=query_column, item_column=item_column,
                rating_column=rating_column, postprocessors=postprocessors,
                item_id_decoder=item_id_decoder, output_format=fmt,
                output_path=output_path,
            )

    return _Preset


class PandasPredictionCallback(_format_preset("pandas")):
    """TopKPredictionsCallback preset to a pandas result (reference:
    replay/models/nn/sequential/callbacks/prediction_callbacks.py:130)."""


class PolarsPredictionCallback(_format_preset("polars")):
    """TopKPredictionsCallback preset to a polars result (reference:
    prediction_callbacks.py:178)."""


class TorchPredictionCallback(_format_preset("arrays")):
    """TopKPredictionsCallback preset to raw arrays — the tensor-output
    analog of the reference's torch variant (prediction_callbacks.py:130)."""


class SparkPredictionCallback(_format_preset("parquet")):
    """TopKPredictionsCallback streaming chunks to parquet — the
    at-scale-output analog of the reference's Spark variant
    (prediction_callbacks.py:226); ``get_result`` returns the path."""


# the reference ships the same accumulators a second time as
# nn/lightning/callback TopItems* classes — same objects here
TopItemsCallbackBase = TopKPredictionsCallback
PandasTopItemsCallback = PandasPredictionCallback
PolarsTopItemsCallback = PolarsPredictionCallback
TorchTopItemsCallback = TorchPredictionCallback
SparkTopItemsCallback = SparkPredictionCallback
BasePredictionCallback = TopKPredictionsCallback
QueryEmbeddingsPredictionCallback = QueryEmbeddingsCallback
HiddenStatesCallback = QueryEmbeddingsCallback


class BasePostProcessor(Protocol):
    """Postprocessor contract (reference: replay/nn/lightning/postprocessor
    PostprocessorBase): mutate/filter a [B, N] logits block before top-k."""

    def __call__(self, logits, batch): ...


PostprocessorBase = BasePostProcessor


class ValidationMetricsCallback:
    """Per-epoch validation-metric recorder (reference:
    replay/models/nn/sequential/callbacks/validation_callback.py) — attach
    to ``Trainer(callbacks=[...])``; collects each epoch's record and
    exposes the metric history."""

    def __init__(self, metrics=("ndcg", "recall", "map"), ks=(1, 5, 10)):
        self.metrics = tuple(metrics)
        self.ks = tuple(ks)
        self.history: List[Dict] = []

    def __call__(self, trainer, record: Dict) -> None:
        self.history.append(dict(record))

    def get_result(self) -> List[Dict]:
        return self.history


# reference names: RemoveSeenItems (nn/lightning postprocessor) and
# ComputeMetricsCallback (nn/lightning/callback)
RemoveSeenItems = SeenItemsFilter
ComputeMetricsCallback = ValidationMetricsCallback
