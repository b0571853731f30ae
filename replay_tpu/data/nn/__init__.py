"""Neural data plane (reference: replay/data/nn/__init__.py).

``TensorMap`` here maps feature names to ``numpy``/``jax`` arrays (the
reference's maps hold torch tensors); ``PandasSequentialDataset`` is an alias
of :class:`SequentialDataset` — pandas is this framework's single host data
plane, so the reference's Pandas/Polars split collapses to one class.
"""

from typing import Dict, Mapping

import numpy as np

from replay_tpu.data.nn.parquet import ParquetDataset, ParquetModule
from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.sequence_tokenizer import SequenceTokenizer
from replay_tpu.data.nn.sequential_dataset import (
    DEFAULT_GROUND_TRUTH_PADDING_VALUE,
    DEFAULT_TRAIN_PADDING_VALUE,
    SequentialDataset,
)
from replay_tpu.data.nn.torch_sequential_dataset import (
    TorchSequentialBatch,
    TorchSequentialDataset,
    TorchSequentialValidationBatch,
    TorchSequentialValidationDataset,
)
from replay_tpu.utils.types import TORCH_AVAILABLE

TensorMap = Mapping[str, np.ndarray]
MutableTensorMap = Dict[str, np.ndarray]

PandasSequentialDataset = SequentialDataset
PolarsSequentialDataset = SequentialDataset

__all__ = [
    "DEFAULT_GROUND_TRUTH_PADDING_VALUE",
    "DEFAULT_TRAIN_PADDING_VALUE",
    "MutableTensorMap",
    "PandasSequentialDataset",
    "ParquetDataset",
    "ParquetModule",
    "PolarsSequentialDataset",
    "SequenceTokenizer",
    "SequentialDataset",
    "TORCH_AVAILABLE",
    "TensorFeatureInfo",
    "TensorFeatureSource",
    "TensorFeatureType",
    "TensorMap",
    "TensorSchema",
    "TorchSequentialBatch",
    "TorchSequentialDataset",
    "TorchSequentialValidationBatch",
    "TorchSequentialValidationDataset",
]
