from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.sequence_tokenizer import SequenceTokenizer
from replay_tpu.data.nn.sequential_dataset import SequentialDataset

__all__ = [
    "SequenceTokenizer",
    "SequentialDataset",
    "TensorFeatureInfo",
    "TensorFeatureSource",
    "TensorFeatureType",
    "TensorSchema",
]
