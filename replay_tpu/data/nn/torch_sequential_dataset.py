"""Map-style per-sample views over :class:`SequentialDataset` — the analog of
the reference's deprecated torch map-style datasets (reference:
replay/data/nn/torch_sequential_dataset.py:29,167).  Batches are plain numpy
(the device data plane consumes padded arrays; there is no torch dependency).

Semantics pinned to the reference:

- sequential features are LEFT-padded to ``max_sequence_length`` with the
  feature's declared ``padding_value``; the boolean ``padding_mask`` has the
  same left-zeros layout;
- ``sliding_window_step`` expands each query into windows anchored at
  offsets-from-start ``left, left-step, …, 0`` (``left = len - max_len``) —
  the exact enumeration of the reference's ``_iter_with_window``
  (replay/data/nn/torch_sequential_dataset.py:148-163), realized through
  :meth:`SequentialDataset.window_index`;
- validation items carry the query's ``ground_truth`` / ``train`` item sets
  right-padded with ``DEFAULT_GROUND_TRUTH_PADDING_VALUE`` /
  ``DEFAULT_TRAIN_PADDING_VALUE``.

The streaming path (:class:`replay_tpu.data.nn.parquet.ParquetDataset` and
``SequentialDataset.batches``) is the recommended, vectorized route — these
classes exist for reference-API compatibility and small-scale use.
"""

from typing import Dict, NamedTuple, Optional

import numpy as np

from replay_tpu.data.nn.sequential_dataset import (
    DEFAULT_GROUND_TRUTH_PADDING_VALUE,
    DEFAULT_TRAIN_PADDING_VALUE,
    SequentialDataset,
)


class TorchSequentialBatch(NamedTuple):
    """One sample (reference: replay/data/nn/torch_sequential_dataset.py:18)."""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]


class TorchSequentialValidationBatch(NamedTuple):
    """One validation sample (reference: torch_sequential_dataset.py:167)."""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]
    ground_truth: np.ndarray
    train: np.ndarray


class TorchSequentialDataset:
    """Per-sample view with reference left-padding/window semantics."""

    def __init__(
        self,
        sequential: SequentialDataset,
        max_sequence_length: int,
        sliding_window_step: Optional[int] = None,
        padding_value: Optional[int] = None,
    ) -> None:
        self._sequential = sequential
        self._max_len = int(max_sequence_length)
        # the reference deprecates the global padding_value in favor of the
        # per-feature schema value; honor an explicit override the same way
        self._padding_override = padding_value
        rows, crops = sequential.window_index(max_sequence_length, sliding_window_step)
        self._rows = rows
        self._crops = crops

    def __len__(self) -> int:
        return len(self._rows)

    def __getitem__(self, index: int) -> TorchSequentialBatch:
        row = int(self._rows[index])
        crop = int(self._crops[index])
        seq_len = self._sequential.sequence_length(row)
        # window = events [o, o+L) with o = seq_len - crop - L clipped at 0
        end = seq_len - crop
        start = max(end - self._max_len, 0)
        n_real = max(end - start, 0)

        mask = np.zeros(self._max_len, dtype=bool)
        if n_real:
            mask[-n_real:] = True

        features: Dict[str, np.ndarray] = {}
        for name in self._sequential.schema.names:
            feature = self._sequential.schema[name]
            values = self._sequential.get_sequence(row, name)
            if feature.is_seq:
                window = values[start:end]
                pad = (
                    self._padding_override
                    if self._padding_override is not None
                    else feature.padding_value
                )
                shape = (self._max_len,) + window.shape[1:]
                out = np.full(shape, pad, dtype=window.dtype)
                if n_real:
                    out[-n_real:] = window
                features[name] = out
            else:
                # non-sequential feature: one value per query (stored
                # per-event here; the query's value is the last one)
                features[name] = np.asarray(values[-1:] if len(values) else values)
        query_id = np.asarray([self._sequential.query_ids[row]])
        return TorchSequentialBatch(query_id, mask, features)


def _pad_right(values: np.ndarray, length: int, pad: int) -> np.ndarray:
    out = np.full(length, pad, dtype=np.int64)
    out[: len(values)] = values[:length] if len(values) > length else values
    return out


class TorchSequentialValidationDataset:
    """Validation view: each sample adds ground-truth and train item sets."""

    def __init__(
        self,
        sequential: SequentialDataset,
        ground_truth: SequentialDataset,
        train: SequentialDataset,
        max_sequence_length: int,
        padding_value: Optional[int] = None,
        sliding_window_step: Optional[int] = None,
        label_feature_name: Optional[str] = None,
    ) -> None:
        label = label_feature_name or ground_truth.schema.item_id_feature_name
        if label is None or label not in ground_truth.schema:
            msg = "Label feature name not found in ground truth schema"
            raise ValueError(msg)
        if label not in train.schema:
            msg = "Label feature name not found in train schema"
            raise ValueError(msg)
        info = ground_truth.schema[label]
        if not info.is_cat:
            msg = "Label feature must be categorical"
            raise ValueError(msg)
        if not info.is_seq:
            msg = "Label feature must be sequential"
            raise ValueError(msg)
        if len(np.intersect1d(sequential.query_ids, ground_truth.query_ids)) == 0:
            msg = "Sequential data and ground truth must contain the same query IDs"
            raise ValueError(msg)

        self._ground_truth = ground_truth
        self._train = train
        self._label = label
        self._max_gt_len = max(
            (ground_truth.sequence_length(i) for i in range(len(ground_truth))),
            default=1,
        )
        self._max_train_len = max(
            (train.sequence_length(i) for i in range(len(train))), default=1
        )
        self._inner = TorchSequentialDataset(
            sequential,
            max_sequence_length,
            sliding_window_step=sliding_window_step,
            padding_value=padding_value,
        )

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, index: int) -> TorchSequentialValidationBatch:
        query_id, mask, features = self._inner[index]
        qid = query_id[0]
        gt = self._lookup(self._ground_truth, qid)
        tr = self._lookup(self._train, qid)
        return TorchSequentialValidationBatch(
            query_id=query_id,
            padding_mask=mask,
            features=features,
            ground_truth=_pad_right(gt, self._max_gt_len, DEFAULT_GROUND_TRUTH_PADDING_VALUE),
            train=_pad_right(tr, self._max_train_len, DEFAULT_TRAIN_PADDING_VALUE),
        )

    def _lookup(self, dataset: SequentialDataset, qid) -> np.ndarray:
        return dataset.get_sequence_by_query_id(qid, self._label)
