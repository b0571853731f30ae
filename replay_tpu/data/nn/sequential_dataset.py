"""Sequential dataset: per-query interaction histories → static-shape batches.

TPU-native counterpart of the reference's sequence pipeline (reference:
replay/data/nn/sequential_dataset.py:142,242 and
replay/data/nn/torch_sequential_dataset.py:29).  The reference yields ragged
per-user tensors that the collate function pads per batch; XLA wants static
shapes, so here every batch is padded to exactly ``(batch_size,
max_sequence_length)`` — including the final partial batch, which carries a
``batch_mask`` row-validity vector.  Sequences are **left-padded / right
aligned** (the reference's convention via ``_pad_sequence``), so the last
position always holds the most recent interaction.

Shuffling is deterministic counter-based: a ``numpy`` Generator seeded with
``(seed, epoch)`` — replica-stable, matching the multi-host determinism
requirement (SURVEY.md §7 hard parts).
"""

from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.nn.schema import TensorSchema

Batch = Dict[str, np.ndarray]

# Reference padding sentinels (replay/data/nn/torch_sequential_dataset.py:179).
# Train-side padding is distinguishable from ground-truth padding so masks can
# be rebuilt from values alone if a pipeline drops its `padding_mask`.
DEFAULT_GROUND_TRUTH_PADDING_VALUE = -1
DEFAULT_TRAIN_PADDING_VALUE = -2


class SequentialDataset:
    """Per-query sequences stored as a flat values array + offsets (CSR-style).

    Flat storage keeps grouping cost O(N log N) once and makes replica
    sharding a pure index computation (reference replicas contract:
    replay/data/nn/parquet/info/replicas.py:7-20).
    """

    def __init__(
        self,
        tensor_schema: TensorSchema,
        query_ids: np.ndarray,
        sequences: Dict[str, np.ndarray],
        offsets: np.ndarray,
    ) -> None:
        self._schema = tensor_schema
        self._query_ids = np.asarray(query_ids)
        self._sequences = sequences
        self._offsets = np.asarray(offsets, dtype=np.int64)

    # --------------------------------------------------------------- factory
    @classmethod
    def from_interactions(
        cls,
        tensor_schema: TensorSchema,
        interactions: pd.DataFrame,
        query_column: str = "query_id",
        timestamp_column: Optional[str] = "timestamp",
        sort: bool = True,
    ) -> "SequentialDataset":
        """Group an encoded interaction log into per-query sequences.

        :param interactions: encoded log; one row per interaction.
        :param sort: sort within query by timestamp (stable), preserving the
            reference's ``orderBy(timestamp)`` grouping semantics.
        """
        frame = interactions
        sort_cols = [query_column]
        if sort and timestamp_column is not None and timestamp_column in frame.columns:
            sort_cols.append(timestamp_column)
        frame = frame.sort_values(sort_cols, kind="stable")

        qvals = frame[query_column].to_numpy()
        uniq, starts = np.unique(qvals, return_index=True)
        offsets = np.append(starts, len(qvals))

        sequences: Dict[str, np.ndarray] = {}
        for feature in tensor_schema.all_features:
            source = feature.feature_source
            column = source.column if source is not None else feature.name
            if column not in frame.columns:
                continue
            values = frame[column].to_numpy()
            if feature.is_cat:
                values = values.astype(np.int32)
            else:
                values = values.astype(np.float32)
            sequences[feature.name] = values
        return cls(tensor_schema, uniq, sequences, offsets)

    # ------------------------------------------------------------- accessors
    @property
    def schema(self) -> TensorSchema:
        return self._schema

    def __len__(self) -> int:
        return len(self._query_ids)

    @property
    def query_ids(self) -> np.ndarray:
        return self._query_ids

    def sequence_length(self, index: int) -> int:
        return int(self._offsets[index + 1] - self._offsets[index])

    def get_sequence(self, index: int, feature_name: str) -> np.ndarray:
        lo, hi = self._offsets[index], self._offsets[index + 1]
        return self._sequences[feature_name][lo:hi]

    def get_sequence_by_query_id(self, query_id, feature_name: str) -> np.ndarray:
        pos = np.searchsorted(self._query_ids, query_id)
        if pos >= len(self._query_ids) or self._query_ids[pos] != query_id:
            return np.array([], dtype=self._sequences[feature_name].dtype)
        return self.get_sequence(pos, feature_name)

    @property
    def max_len(self) -> int:
        if len(self._offsets) <= 1:
            return 0
        return int(np.max(np.diff(self._offsets)))

    # -- reference-named accessors (replay/data/nn/sequential_dataset.py:30-58)
    def get_query_id(self, index: int) -> int:
        return self._query_ids[index].item()

    def get_all_query_ids(self) -> np.ndarray:
        return self._query_ids

    def get_sequence_length(self, index: int) -> int:
        return self.sequence_length(index)

    def get_max_sequence_length(self) -> int:
        return self.max_len

    # ------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        """Persist as a directory: one npz of flat arrays + pickled schema
        (reference: sequential_dataset.py:107 save)."""
        import pickle
        from pathlib import Path

        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        np.savez(
            out / "arrays.npz",
            query_ids=self._query_ids,
            offsets=self._offsets,
            **{f"seq_{name}": arr for name, arr in self._sequences.items()},
        )
        (out / "tensor_schema.pkl").write_bytes(pickle.dumps(self._schema))

    @classmethod
    def load(cls, path: str, **kwargs) -> "SequentialDataset":  # noqa: ARG003
        """Restore a saved dataset (reference: sequential_dataset.py:219)."""
        import pickle
        from pathlib import Path

        src = Path(path)
        schema = pickle.loads((src / "tensor_schema.pkl").read_bytes())
        with np.load(src / "arrays.npz", allow_pickle=False) as blob:
            query_ids = blob["query_ids"]
            offsets = blob["offsets"]
            sequences = {
                key[len("seq_"):]: blob[key]
                for key in blob.files
                if key.startswith("seq_")
            }
        return cls(schema, query_ids, sequences, offsets)

    def filter_by_query_id(self, query_ids_to_keep: np.ndarray) -> "SequentialDataset":
        keep = np.isin(self._query_ids, query_ids_to_keep)
        idx = np.nonzero(keep)[0]
        new_offsets = [0]
        new_seqs: Dict[str, list] = {name: [] for name in self._sequences}
        for i in idx:
            lo, hi = self._offsets[i], self._offsets[i + 1]
            for name in self._sequences:
                new_seqs[name].append(self._sequences[name][lo:hi])
            new_offsets.append(new_offsets[-1] + (hi - lo))
        merged = {
            name: (np.concatenate(chunks) if chunks else np.array([], dtype=self._sequences[name].dtype))
            for name, chunks in new_seqs.items()
        }
        return SequentialDataset(
            self._schema,
            self._query_ids[idx],
            merged,
            np.asarray(new_offsets, dtype=np.int64),
        )

    def padded_sequences(
        self,
        query_ids: np.ndarray,
        feature_name: str,
        length: Optional[int] = None,
        pad_value: int = -1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Right-padded [B, length] sequences for a batch of query ids, fully
        vectorized (no per-row Python; the validation/seen-mask hot path).

        Queries absent from the dataset yield all-padding rows.

        :returns: (values [B, length], lengths [B]).
        """
        qids = np.asarray(query_ids)
        values = self._sequences[feature_name]
        length = length if length is not None else max(self.max_len, 1)
        pos = np.searchsorted(self._query_ids, qids)
        pos_c = np.clip(pos, 0, max(len(self._query_ids) - 1, 0))
        found = (
            (self._query_ids[pos_c] == qids)
            if len(self._query_ids)
            else np.zeros(len(qids), dtype=bool)
        )
        lo = self._offsets[pos_c]
        hi = self._offsets[pos_c + 1]
        lens = np.where(found, np.minimum(hi - lo, length), 0).astype(np.int64)
        col = np.arange(length)
        src = lo[:, None] + col[None, :]
        valid = col[None, :] < lens[:, None]
        src_safe = np.clip(src, 0, max(len(values) - 1, 0))
        out = np.where(valid, values[src_safe] if len(values) else pad_value, pad_value)
        return out, lens

    @staticmethod
    def keep_common_query_ids(
        lhs: "SequentialDataset", rhs: "SequentialDataset"
    ) -> Tuple["SequentialDataset", "SequentialDataset"]:
        """Intersect two datasets on query id (reference:
        replay/data/nn/sequential_dataset.py:116)."""
        common = np.intersect1d(lhs.query_ids, rhs.query_ids)
        return lhs.filter_by_query_id(common), rhs.filter_by_query_id(common)

    # --------------------------------------------------------------- batching
    def pad_batch(
        self,
        indices: np.ndarray,
        max_sequence_length: int,
        crop_offset: int = 0,
    ) -> Batch:
        """Materialize rows ``indices`` as left-padded fixed-shape arrays.

        Returns a dict with one ``[B, L]`` array per sequential feature, one
        ``[B]`` array per non-sequential feature, plus:

        - ``"query_id"``: [B] query ids
        - ``"padding_mask"``: [B, L] int8; 1 = real token
        - ``"seq_len"``: [B] true (cropped) lengths

        :param crop_offset: drop this many of the *most recent* events before
            taking the last ``max_sequence_length`` (used to build label
            shifts host-side and sliding windows); scalar or [B] array.
        """
        indices = np.asarray(indices)
        crop_offset = np.asarray(crop_offset)
        length = max_sequence_length
        out: Batch = {}

        # vectorized gather: for row r and column c, the source position is
        # hi_r - (length - c); valid where it lies inside [lo_r, hi_r)
        lo = self._offsets[indices]
        hi = self._offsets[indices + 1] - crop_offset
        take = np.clip(hi - lo, 0, length)
        col = np.arange(length)
        src = hi[:, None] - (length - col)[None, :]  # [B, L]
        valid = (src >= lo[:, None]) & (src >= 0) & (hi[:, None] > lo[:, None])
        src_safe = np.clip(src, 0, max(len(self._offsets) and self._offsets[-1] - 1, 0))

        mask = valid.astype(np.int8)
        seq_len = take.astype(np.int32)
        for feature in self._schema.all_features:
            name = feature.name
            if name not in self._sequences:
                continue
            values = self._sequences[name]
            if feature.is_seq:
                dtype = np.int32 if feature.is_cat else np.float32
                gathered = values[src_safe]
                arr = np.where(valid, gathered, feature.padding_value).astype(dtype)
                out[name] = arr
            else:
                # non-sequential feature: last value per query
                arr_dtype = np.int32 if feature.is_cat else np.float32
                out[name] = values[self._offsets[indices + 1] - 1].astype(arr_dtype)
        out["query_id"] = self._query_ids[indices]
        out["padding_mask"] = mask
        out["seq_len"] = seq_len
        return out

    def window_index(
        self, max_sequence_length: int, sliding_window_step: Optional[int]
    ):
        """(row, crop_offset) pairs for every training sample.

        ``sliding_window_step=None``: one sample per query — the most recent
        ``max_sequence_length`` events (crop 0).  With a step, each query
        yields windows anchored at offsets-from-start
        ``left, left-step, …, >0`` then 0 (``left = len - max_len``) —
        the reference's iteration order
        (reference: replay/data/nn/torch_sequential_dataset.py:148-163) —
        expressed as most-recent-crop offsets ``0, step, 2·step, …, left``.
        """
        n = len(self)
        lens = np.diff(self._offsets)
        if sliding_window_step is None:
            return np.arange(n), np.zeros(n, dtype=np.int64)
        rows, crops = [], []
        step = int(sliding_window_step)
        for i in range(n):
            left = int(lens[i]) - max_sequence_length
            k = 0
            while left - k * step > 0:
                rows.append(i)
                crops.append(k * step)
                k += 1
            rows.append(i)
            crops.append(max(left, 0))
        return np.asarray(rows), np.asarray(crops, dtype=np.int64)

    def batches(
        self,
        batch_size: int,
        max_sequence_length: int,
        shuffle: bool = False,
        seed: int = 0,
        epoch: int = 0,
        drop_last: bool = False,
        replica_id: int = 0,
        num_replicas: int = 1,
        transform: Optional[Callable[[Batch], Batch]] = None,
        sliding_window_step: Optional[int] = None,
    ) -> Iterator[Batch]:
        """Yield static-shape batches, optionally sharded across replicas.

        Every batch has exactly ``batch_size`` rows; short final batches are
        padded with repeated row 0 and flagged via ``batch_mask`` ([B] int8,
        1 = real row).  Replica sharding pads the index set to a multiple of
        ``num_replicas`` then strides (reference partitioning contract:
        replay/data/nn/parquet/info/partitioning.py:31-60).
        ``sliding_window_step`` expands each query into overlapping windows
        (reference: torch_sequential_dataset.py:148).
        """
        rows, crops = self.window_index(max_sequence_length, sliding_window_step)
        n = len(rows)
        order = np.arange(n)
        if shuffle:
            rng = np.random.Generator(np.random.Philox(key=[seed, epoch]))
            rng.shuffle(order)
        if num_replicas > 1:
            padded_n = -(-n // num_replicas) * num_replicas
            order = np.resize(order, padded_n)
            order = order[replica_id::num_replicas]
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            real = len(chunk)
            if real < batch_size:
                if drop_last:
                    return
                chunk = np.resize(chunk, batch_size)
            batch = self.pad_batch(
                rows[chunk], max_sequence_length, crop_offset=crops[chunk]
            )
            batch_mask = np.zeros(batch_size, dtype=np.int8)
            batch_mask[:real] = 1
            batch["batch_mask"] = batch_mask
            if transform is not None:
                batch = transform(batch)
            yield batch
