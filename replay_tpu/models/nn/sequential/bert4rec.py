"""Old-stack Bert4Rec surface (reference:
replay/models/nn/sequential/bert4rec/{lightning,model,dataset}.py).

The model is the canonical flax Bert4Rec
(:mod:`replay_tpu.nn.sequential.bert4rec`); ``Bert4RecModel`` aliases it.
The masker and dataset classes reproduce the reference's masked-LM batch
semantics over numpy:

- ``Bert4RecUniformMasker.mask(paddings)`` returns a 0/1 vector where 0 =
  masked position; padded positions are always 0, an all-unmasked row gets
  its last position masked, an all-masked row gets position -2 unmasked
  (reference: dataset.py:72-92);
- prediction/validation batches shift every sequential feature one step
  left and open a mask slot at the last position (reference:
  dataset.py:322-351).
"""

from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.data.nn.torch_sequential_dataset import (
    TorchSequentialDataset,
    TorchSequentialValidationDataset,
)
from replay_tpu.nn.sequential.bert4rec import Bert4Rec, Bert4RecBody
from replay_tpu.utils.types import TORCH_AVAILABLE

Bert4RecModel = Bert4Rec


class Bert4RecTrainingBatch(NamedTuple):
    """reference: replay/models/nn/sequential/bert4rec/dataset.py:17"""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]
    tokens_mask: np.ndarray
    labels: np.ndarray

    def convert_to_dict(self) -> dict:
        return {
            "query_id": self.query_id,
            "pad_mask": self.padding_mask,
            "inputs": self.features,
            "token_mask": self.tokens_mask,
            "positive_labels": self.labels,
        }


class Bert4RecPredictionBatch(NamedTuple):
    """reference: replay/models/nn/sequential/bert4rec/dataset.py:176"""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]
    tokens_mask: np.ndarray

    def convert_to_dict(self) -> dict:
        return {
            "query_id": self.query_id,
            "pad_mask": self.padding_mask,
            "inputs": self.features,
            "token_mask": self.tokens_mask,
        }


class Bert4RecValidationBatch(NamedTuple):
    """reference: replay/models/nn/sequential/bert4rec/dataset.py:240"""

    query_id: np.ndarray
    padding_mask: np.ndarray
    features: Dict[str, np.ndarray]
    tokens_mask: np.ndarray
    ground_truth: np.ndarray
    train: np.ndarray


class Bert4RecMasker:
    """Masking-strategy protocol (reference: dataset.py:39)."""

    def mask(self, paddings: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class Bert4RecUniformMasker(Bert4RecMasker):
    """Uniform token masking (reference: dataset.py:55-92)."""

    def __init__(self, mask_prob: float = 0.15, rng: Optional[np.random.Generator] = None):
        self.mask_prob = float(mask_prob)
        self.rng = rng or np.random.default_rng()

    def mask(self, paddings: np.ndarray) -> np.ndarray:
        paddings = np.asarray(paddings).astype(np.float32)
        draw = self.rng.random(paddings.shape[-1], dtype=np.float32)
        # 0 = masked; padded positions are masked by construction
        mask = (draw * paddings) >= self.mask_prob
        if mask.all():
            mask[-1] = False
        elif (not mask.any()) and len(mask) > 1:
            mask[-2] = True
        return mask


def _shift_features(
    schema: TensorSchema,
    features: Dict[str, np.ndarray],
    padding_mask: np.ndarray,
) -> Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray]:
    """Open a mask slot at the end for next-item inference (reference:
    dataset.py:322-351)."""

    def shift(seq: np.ndarray, pad) -> np.ndarray:
        out = np.roll(seq, -1, axis=0)
        out[-1, ...] = pad
        return out

    shifted: Dict[str, np.ndarray] = {}
    for name in schema.names:
        info = schema[name]
        if info.is_seq:
            shifted[name] = shift(features[name], info.padding_value)
        else:
            shifted[name] = features[name]
    tokens_mask = shift(padding_mask.astype(bool), False)
    shifted_padding_mask = tokens_mask.copy()
    shifted_padding_mask[-1] = True
    return shifted, shifted_padding_mask, tokens_mask


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


class Bert4RecTrainingDataset:
    """Masked-LM training samples (reference: dataset.py:95-172)."""

    def __init__(
        self,
        sequential: SequentialDataset,
        max_sequence_length: int,
        masker: Optional[Bert4RecMasker] = None,
        sliding_window_step: Optional[int] = None,
        padding_value: Optional[int] = None,
        label_feature_name: Optional[str] = None,
    ) -> None:
        self._label = _check_label(sequential, label_feature_name)
        self._masker = masker or Bert4RecUniformMasker()
        self._inner = TorchSequentialDataset(
            sequential,
            max_sequence_length,
            sliding_window_step=sliding_window_step,
            padding_value=padding_value,
        )

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, index: int) -> dict:
        query_id, padding_mask, features = self._inner[index]
        tokens_mask = self._masker.mask(padding_mask)
        return Bert4RecTrainingBatch(
            query_id=query_id,
            padding_mask=padding_mask,
            features=features,
            tokens_mask=tokens_mask,
            labels=features[self._label],
        ).convert_to_dict()


class Bert4RecPredictionDataset:
    """Next-item inference samples (reference: dataset.py:196-237)."""

    def __init__(
        self,
        sequential: SequentialDataset,
        max_sequence_length: int,
        padding_value: Optional[int] = None,
    ) -> None:
        self._schema = sequential.schema
        self._inner = TorchSequentialDataset(
            sequential, max_sequence_length, padding_value=padding_value
        )

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, index: int) -> dict:
        query_id, padding_mask, features = self._inner[index]
        shifted, pad_mask, tokens_mask = _shift_features(self._schema, features, padding_mask)
        return Bert4RecPredictionBatch(
            query_id=query_id,
            padding_mask=pad_mask,
            features=shifted,
            tokens_mask=tokens_mask,
        ).convert_to_dict()


class Bert4RecValidationDataset:
    """Validation samples with ground-truth/train item sets (reference:
    dataset.py:264-318)."""

    def __init__(
        self,
        sequential: SequentialDataset,
        ground_truth: SequentialDataset,
        train: SequentialDataset,
        max_sequence_length: int,
        padding_value: Optional[int] = None,
        label_feature_name: Optional[str] = None,
    ) -> None:
        self._schema = sequential.schema
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
        shifted, pad_mask, tokens_mask = _shift_features(self._schema, features, padding_mask)
        return {
            "query_id": query_id,
            "pad_mask": pad_mask,
            "inputs": shifted,
            "token_mask": tokens_mask,
            "ground_truth": ground_truth,
            "train": train,
        }


__all__ = [
    "Bert4Rec",
    "Bert4RecBody",
    "Bert4RecMasker",
    "Bert4RecModel",
    "Bert4RecPredictionBatch",
    "Bert4RecPredictionDataset",
    "Bert4RecTrainingBatch",
    "Bert4RecTrainingDataset",
    "Bert4RecUniformMasker",
    "Bert4RecValidationBatch",
    "Bert4RecValidationDataset",
    "TORCH_AVAILABLE",
]
