"""ANN extension: accelerate predict for item-vector models.

TPU-native analog of the reference's ANN extension (reference:
replay/models/extensions/ann/ann_mixin.py:26 ANNMixin, param entities
entities/*.py, builders index_builders/*.py, stores index_stores/*.py).

The reference swaps full scoring for an HNSW lookup when an
``index_builder`` is configured.  Here the same contract: models carrying
an ``index_builder`` (an ``HnswParam``) build the native C++ index over
their item vectors at fit time and answer predict via ``knn_query`` with
over-fetch + post-filter of seen items (the reference's k+max_seen
over-generation, base_rec.py:152-201).  Index persistence = one binary
file (the reference's shared-disk IndexStore default).
"""

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from replay_tpu.ann.hnsw import HnswIndex


@dataclass
class HnswParam:
    """Index hyperparameters (reference: entities/hnswlib_param.py)."""

    space: str = "ip"
    m: int = 16
    ef_construction: int = 200
    ef_search: int = 100


@dataclass
class SparseSimParam:
    """Marker/params for sparse item-item index serving on NeighbourRec
    models (reference: entities/nmslib_hnsw_param.py). The native scorer is
    exact, so graph hyperparameters are unnecessary; ``None`` fields are
    kept for API familiarity."""

    space: str = "negdotprod_sparse"


class ANNMixin:
    """Adds ANN-backed predict to models exposing ``_get_item_vectors`` and
    per-query vectors.  Activated by setting ``index_builder``."""

    index_builder: Optional[HnswParam] = None
    _ann_index: Optional[HnswIndex] = None

    @property
    def ann_enabled(self) -> bool:
        return self.index_builder is not None

    def init_index_builder(self, index_builder=None) -> None:
        """Install (or clear) the ANN index parameters (reference:
        replay/models/extensions/ann/ann_mixin.py:35).  Unlike the reference,
        ANN is always available — the HNSW implementation is in-tree C++ —
        so no dependency gate.  Accepts an ``HnswParam``/``SparseSimParam``
        instance or a kwargs dict for ``HnswParam``."""
        if index_builder is None or isinstance(index_builder, (HnswParam, SparseSimParam)):
            self.index_builder = index_builder
        elif isinstance(index_builder, dict):
            self.index_builder = HnswParam(**index_builder)
        else:
            msg = f"unsupported index_builder: {type(index_builder).__name__}"
            raise TypeError(msg)

    def init_builder_from_dict(self, init_meta: dict) -> None:
        """Rebuild index parameters from saved init meta (reference:
        ann_mixin.py:194): ``{"index_param": {"class", "init_args"}}`` — the
        builder/store indirection of the reference collapses to the param
        object here (one in-tree index family, one disk store)."""
        param_meta = init_meta.get("index_param", init_meta)
        cls_name = param_meta.get("class", "HnswParam")
        cls = {"HnswParam": HnswParam, "SparseSimParam": SparseSimParam}[cls_name]
        self.index_builder = cls(**param_meta.get("init_args", {}))

    def _build_ann_index(self) -> None:
        vectors = np.asarray(self._get_item_vectors(), dtype=np.float32)
        param = self.index_builder
        index = HnswIndex(
            dim=vectors.shape[1],
            space=param.space,
            m=param.m,
            ef_construction=param.ef_construction,
        )
        index.add_items(vectors, np.arange(len(vectors), dtype=np.int64))
        index.set_ef(param.ef_search)
        self._ann_index = index

    def _ann_predict(
        self,
        query_vectors: np.ndarray,
        query_ids: np.ndarray,
        k: int,
        seen_lists=None,
    ) -> pd.DataFrame:
        """Top-k via the index; seen items are excluded INSIDE the native
        search (reference filter-seen inferers,
        index_inferers/*filter*_inferer.py) — no Python over-fetch loop."""
        queries = np.asarray(query_vectors, dtype=np.float32)
        if seen_lists:
            # map raw seen ids → index labels (= fit_items positions)
            n_items = len(self.fit_items)
            exclude = []
            for seen in seen_lists:
                ids = np.asarray(seen)
                pos = np.searchsorted(self.fit_items, ids)
                pos_c = np.minimum(pos, n_items - 1)
                exclude.append(pos[ids == self.fit_items[pos_c]] if len(ids) else pos[:0])
            labels, dists = self._ann_index.knn_query_filtered(queries, k, exclude)
        else:
            labels, dists = self._ann_index.knn_query(queries, min(k, len(self._ann_index)))
        rows = []
        for row, qid in enumerate(query_ids):
            for pos in range(labels.shape[1]):
                item_pos = labels[row, pos]
                if item_pos < 0:
                    break
                rows.append((qid, self.fit_items[item_pos], -float(dists[row, pos])))
        return pd.DataFrame(rows, columns=[self.query_column, self.item_column, self.rating_column])

    # ----------------------------------------------------------- persistence
    def _save_index(self, path: str) -> None:
        if self._ann_index is not None:
            self._ann_index.save(str(Path(path) / "hnsw.bin"))

    def _load_index(self, path: str) -> None:
        index_path = Path(path) / "hnsw.bin"
        if index_path.exists() and self.index_builder is not None:
            self._ann_index = HnswIndex.load(str(index_path), space=self.index_builder.space)
            self._ann_index.set_ef(self.index_builder.ef_search)
