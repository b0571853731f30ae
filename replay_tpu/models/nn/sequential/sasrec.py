"""Old-stack SasRec surface (reference:
replay/models/nn/sequential/sasrec/{lightning,model,dataset}.py).

The model itself is the canonical flax SasRec
(:mod:`replay_tpu.nn.sequential.sasrec`); ``SasRecModel`` aliases it (the
reference splits a Lightning wrapper from a torch module — here one flax
module plays both roles).  The map-style dataset classes reproduce the
reference's next-token shift semantics (dataset.py:104-127) over numpy
batches: the inner window is ``max_sequence_length + shift`` long, features
keep positions ``[:-shift]``, labels take ``[shift:]``.
"""

from typing import Dict, NamedTuple, Optional

import numpy as np

from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.data.nn.torch_sequential_dataset import (
    TorchSequentialDataset,
    TorchSequentialValidationDataset,
)
from replay_tpu.nn.sequential.sasrec import SasRec, SasRecBody, SasRecTransformerLayer

SasRecModel = SasRec


class SasRecTrainingBatch(NamedTuple):
    """reference: replay/models/nn/sequential/sasrec/dataset.py:20"""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]
    labels: np.ndarray
    labels_padding_mask: np.ndarray

    def convert_to_dict(self) -> dict:
        return {
            "query_id": self.query_id,
            "feature_tensor": self.features,
            "padding_mask": self.padding_mask,
            "positive_labels": self.labels,
            "target_padding_mask": self.labels_padding_mask,
        }


class SasRecPredictionBatch(NamedTuple):
    """reference: replay/models/nn/sequential/sasrec/dataset.py:133"""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]

    def convert_to_dict(self) -> dict:
        return {
            "query_id": self.query_id,
            "feature_tensor": self.features,
            "padding_mask": self.padding_mask,
        }


class SasRecValidationBatch(NamedTuple):
    """reference: replay/models/nn/sequential/sasrec/dataset.py:195"""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]
    ground_truth: np.ndarray
    train: np.ndarray


def _check_label(sequential: SequentialDataset, label_feature_name: Optional[str]) -> str:
    if label_feature_name:
        if label_feature_name not in sequential.schema:
            msg = "Label feature name not found in provided schema"
            raise ValueError(msg)
        if not sequential.schema[label_feature_name].is_cat:
            msg = "Label feature must be categorical"
            raise ValueError(msg)
        if not sequential.schema[label_feature_name].is_seq:
            msg = "Label feature must be sequential"
            raise ValueError(msg)
        return label_feature_name
    label = sequential.schema.item_id_feature_name
    if label is None:
        msg = "Schema has no item-id feature and no label_feature_name given"
        raise ValueError(msg)
    return label


class SasRecTrainingDataset:
    """Next-token training samples (reference: dataset.py:43-127)."""

    def __init__(
        self,
        sequential: SequentialDataset,
        max_sequence_length: int,
        sequence_shift: int = 1,
        sliding_window_step: Optional[int] = None,
        padding_value: Optional[int] = None,
        label_feature_name: Optional[str] = None,
    ) -> None:
        self._label = _check_label(sequential, label_feature_name)
        self._shift = int(sequence_shift)
        self._schema = sequential.schema
        self._inner = TorchSequentialDataset(
            sequential,
            max_sequence_length + self._shift,
            sliding_window_step=sliding_window_step,
            padding_value=padding_value,
        )

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, index: int) -> dict:
        query_id, padding_mask, features = self._inner[index]
        labels = features[self._label][self._shift :]
        labels_padding_mask = padding_mask[self._shift :]
        output: Dict[str, np.ndarray] = {}
        for name in self._schema.names:
            value = features[name]
            if self._schema[name].is_seq:
                value = value[: -self._shift]
            output[name] = value
        return SasRecTrainingBatch(
            query_id=query_id,
            padding_mask=padding_mask[: -self._shift],
            features=output,
            labels=labels,
            labels_padding_mask=labels_padding_mask,
        ).convert_to_dict()


class SasRecPredictionDataset:
    """Most-recent-window inference samples (reference: dataset.py:152-189)."""

    def __init__(
        self,
        sequential: SequentialDataset,
        max_sequence_length: int,
        padding_value: Optional[int] = None,
    ) -> None:
        self._inner = TorchSequentialDataset(
            sequential, max_sequence_length, padding_value=padding_value
        )

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, index: int) -> dict:
        query_id, padding_mask, features = self._inner[index]
        return SasRecPredictionBatch(query_id, padding_mask, features).convert_to_dict()


class SasRecValidationDataset:
    """Validation samples with ground-truth/train item sets (reference:
    dataset.py:218-268)."""

    def __init__(
        self,
        sequential: SequentialDataset,
        ground_truth: SequentialDataset,
        train: SequentialDataset,
        max_sequence_length: int,
        padding_value: Optional[int] = None,
        label_feature_name: Optional[str] = None,
    ) -> None:
        self._inner = TorchSequentialValidationDataset(
            sequential,
            ground_truth,
            train,
            max_sequence_length,
            padding_value=padding_value,
            label_feature_name=label_feature_name,
        )

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, index: int) -> dict:
        query_id, padding_mask, features, ground_truth, train = self._inner[index]
        return {
            "query_id": query_id,
            "padding_mask": padding_mask,
            "feature_tensor": features,
            "ground_truth": ground_truth,
            "train": train,
        }


__all__ = [
    "SasRec",
    "SasRecBody",
    "SasRecModel",
    "SasRecPredictionBatch",
    "SasRecPredictionDataset",
    "SasRecTrainingBatch",
    "SasRecTrainingDataset",
    "SasRecTransformerLayer",
    "SasRecValidationBatch",
    "SasRecValidationDataset",
]
