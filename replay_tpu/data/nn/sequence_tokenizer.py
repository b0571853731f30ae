"""SequenceTokenizer: Dataset → encoded SequentialDataset.

TPU-native analog of the reference (reference:
replay/data/nn/sequence_tokenizer.py:29 — deprecated upstream in favor of
the parquet path, but still the convenient in-memory pipeline): encodes
every categorical column with a DatasetLabelEncoder, groups interactions
into per-query sequences ordered by timestamp, and yields the
SequentialDataset consumed by the Trainer.
"""

from typing import Optional, Union

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.dataset_utils import DatasetLabelEncoder
from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.preprocessing.label_encoder import LabelEncoder


class SequenceTokenizer:
    """Encode a Dataset's categoricals and build per-query sequences."""

    def __init__(
        self,
        tensor_schema: TensorSchema,
        handle_unknown_rule: str = "error",
        default_value_rule: Union[int, str, None] = None,
    ) -> None:
        self._tensor_schema = tensor_schema
        self._encoder = DatasetLabelEncoder(
            handle_unknown_rule=handle_unknown_rule,
            default_value_rule=default_value_rule,
        )

    @property
    def tensor_schema(self) -> TensorSchema:
        return self._tensor_schema

    def fit(self, dataset: Dataset) -> "SequenceTokenizer":
        self._encoder.fit(dataset)
        return self

    def transform(self, dataset: Dataset) -> SequentialDataset:
        encoded = self._encoder.transform(dataset)
        schema = dataset.feature_schema
        return SequentialDataset.from_interactions(
            self._tensor_schema,
            encoded.interactions,
            query_column=schema.query_id_column,
            timestamp_column=schema.interactions_timestamp_column,
        )

    def fit_transform(self, dataset: Dataset) -> SequentialDataset:
        return self.fit(dataset).transform(dataset)

    # -------------------------------------------------------------- encoders
    @property
    def query_id_encoder(self) -> LabelEncoder:
        return self._encoder.query_id_encoder

    @property
    def item_id_encoder(self) -> LabelEncoder:
        return self._encoder.item_id_encoder

    @property
    def query_and_item_id_encoder(self) -> LabelEncoder:
        return self._encoder.query_and_item_id_encoder
