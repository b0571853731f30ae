"""SequenceTokenizer: Dataset → encoded SequentialDataset.

TPU-native analog of the reference (reference:
replay/data/nn/sequence_tokenizer.py:29): encodes every categorical column
with a DatasetLabelEncoder, validates the tensor schema against the
dataset (:300 _check_tensor_schema, :325 _check_if_tensor_schema_matches_data),
assigns cardinalities (:393), joins query-/item-feature sources onto the
event log (the reference's per-source sequence processors :606-780 become
two vectorized merges), groups into per-query sequences ordered by
timestamp, and round-trips through ``save``/``load`` (:410,:463).

Design note: the reference materializes one ragged python list per feature;
here every feature lands in the SequentialDataset's flat CSR storage —
item-feature and seq query-feature sources become per-event columns via a
merge, and non-seq query features ride the same storage with
last-value-per-query extraction at batch time.
"""

import json
import pickle
from pathlib import Path
from typing import Optional, Sequence, Union

import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.dataset_utils import DatasetLabelEncoder
from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.data.schema import FeatureSource
from replay_tpu.preprocessing.label_encoder import LabelEncoder


class SequenceTokenizer:
    """Encode a Dataset's categoricals and build per-query sequences."""

    def __init__(
        self,
        tensor_schema: TensorSchema,
        handle_unknown_rule: str = "error",
        default_value_rule: Union[int, str, None] = None,
    ) -> None:
        self._check_tensor_schema(tensor_schema)
        self._tensor_schema = tensor_schema
        self._handle_unknown_rule = handle_unknown_rule
        self._default_value_rule = default_value_rule
        self._encoder = DatasetLabelEncoder(
            handle_unknown_rule=handle_unknown_rule,
            default_value_rule=default_value_rule,
        )

    @property
    def tensor_schema(self) -> TensorSchema:
        return self._tensor_schema

    def fit(self, dataset: Dataset) -> "SequenceTokenizer":
        self._check_tensor_schema_matches_data(dataset, self._tensor_schema)
        self._encoder.fit(dataset)
        self._assign_tensor_features_cardinality(dataset)
        return self

    def transform(
        self, dataset: Dataset, tensor_features_to_keep: Optional[Sequence[str]] = None
    ) -> SequentialDataset:
        self._check_tensor_schema_matches_data(
            dataset, self._tensor_schema, tensor_features_to_keep
        )
        encoded = self._encoder.transform(dataset)
        schema = dataset.feature_schema
        tensor_schema = self._tensor_schema
        if tensor_features_to_keep is not None:
            tensor_schema = tensor_schema.subset(tensor_features_to_keep)
        interactions = self._join_feature_sources(encoded, tensor_schema)
        return SequentialDataset.from_interactions(
            tensor_schema,
            interactions,
            query_column=schema.query_id_column,
            timestamp_column=schema.interactions_timestamp_column,
        )

    def fit_transform(self, dataset: Dataset) -> SequentialDataset:
        return self.fit(dataset).transform(dataset)

    # ------------------------------------------------------- feature joins
    def _join_feature_sources(
        self, encoded: Dataset, tensor_schema: TensorSchema
    ) -> pd.DataFrame:
        """Merge query-/item-feature source columns onto the event log so
        every tensor feature is a per-event column (reference processors:
        sequence_tokenizer.py:664-780 do the same via per-row .loc loops)."""
        schema = encoded.feature_schema
        interactions = encoded.interactions
        query_col = schema.query_id_column
        item_col = schema.item_id_column

        item_cols, query_cols = [], []
        for feature in tensor_schema.all_features:
            source = feature.feature_source
            if source is None:
                continue
            if source.source == FeatureSource.ITEM_FEATURES:
                item_cols.append(source.column)
            elif source.source == FeatureSource.QUERY_FEATURES:
                query_cols.append(source.column)

        if item_cols:
            right = encoded.item_features[[item_col, *dict.fromkeys(item_cols)]]
            interactions = interactions.merge(right, on=item_col, how="left")
        if query_cols:
            right = encoded.query_features[[query_col, *dict.fromkeys(query_cols)]]
            interactions = interactions.merge(right, on=query_col, how="left")
        return interactions

    # -------------------------------------------------------------- checks
    @staticmethod
    def _check_tensor_schema(tensor_schema: TensorSchema) -> None:
        """Schema-internal invariants (reference: sequence_tokenizer.py:300)."""
        for feature in tensor_schema.all_features:
            if not feature.feature_sources:
                msg = f"All tensor features must have sources defined: {feature.name}"
                raise ValueError(msg)

    @staticmethod
    def _check_tensor_schema_matches_data(
        dataset: Dataset,
        tensor_schema: TensorSchema,
        tensor_features_to_keep: Optional[Sequence[str]] = None,
    ) -> None:
        """Every source column must exist in its source frame; id features
        must line up (reference: sequence_tokenizer.py:325 — error texts
        preserved)."""
        schema = dataset.feature_schema
        query_col, item_col = schema.query_id_column, schema.item_id_column
        interaction_cols = {*schema.interaction_features.columns, query_col, item_col}
        query_cols = {*schema.query_features.columns, query_col}
        item_cols = {*schema.item_features.columns, item_col}

        for name, feature in ((f.name, f) for f in tensor_schema.all_features):
            if tensor_features_to_keep is not None and name not in tensor_features_to_keep:
                continue
            for source in feature.feature_sources or []:
                if source.source == FeatureSource.INTERACTIONS:
                    if source.column not in interaction_cols:
                        msg = f"Expected column '{source.column}' in dataset"
                        raise ValueError(msg)
                elif source.source == FeatureSource.QUERY_FEATURES:
                    if dataset.query_features is None:
                        msg = (
                            f"Expected column '{source.column}', "
                            "but query features are not specified"
                        )
                        raise ValueError(msg)
                    if source.column not in query_cols:
                        msg = f"Expected column '{source.column}' in query features data frame"
                        raise ValueError(msg)
                elif source.source == FeatureSource.ITEM_FEATURES:
                    if dataset.item_features is None:
                        msg = (
                            f"Expected column '{source.column}', "
                            "but item features are not specified"
                        )
                        raise ValueError(msg)
                    if source.column not in item_cols:
                        msg = f"Expected column '{source.column}' in item features data frame"
                        raise ValueError(msg)
                else:
                    msg = f"Found unexpected table '{source.source}' in tensor schema"
                    raise ValueError(msg)

        if tensor_schema.item_id_feature_name is None:
            msg = "Tensor schema must have item id feature defined"
            raise ValueError(msg)
        item_feature = tensor_schema[tensor_schema.item_id_feature_name]
        if item_feature.feature_source.column != item_col:
            msg = "Tensor schema item ID source colum does not match item ID in data frame"
            raise ValueError(msg)
        query_name = tensor_schema.query_id_feature_name
        if query_name is not None:
            query_feature = tensor_schema[query_name]
            if query_feature.feature_source.column != query_col:
                msg = "Tensor schema query ID source colum does not match query ID in data frame"
                raise ValueError(msg)

    def _assign_tensor_features_cardinality(self, dataset: Dataset) -> None:
        """Pull cardinalities from the fitted dataset schema (reference:
        sequence_tokenizer.py:393)."""
        for feature in self._tensor_schema.all_features:
            if not feature.is_cat or feature.cardinality is not None:
                continue
            column = feature.feature_source.column
            if column in dataset.feature_schema.columns:
                card = dataset.feature_schema[column].cardinality
                if card is not None:
                    feature._set_cardinality(card)

    # ------------------------------------------------------------ save/load
    def save(self, path: str, use_pickle: bool = False) -> None:
        """Persist the fitted tokenizer (reference: sequence_tokenizer.py:463).

        ``use_pickle=False`` writes an inspectable directory (init args json +
        pickled encoder + schema); ``True`` writes one pickle file."""
        if use_pickle:
            Path(path).write_bytes(pickle.dumps(self))
            return
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        (out / "init_args.json").write_text(
            json.dumps(
                {
                    "handle_unknown_rule": self._handle_unknown_rule,
                    "default_value_rule": self._default_value_rule,
                }
            )
        )
        (out / "tensor_schema.pkl").write_bytes(pickle.dumps(self._tensor_schema))
        (out / "encoder.pkl").write_bytes(pickle.dumps(self._encoder))

    @classmethod
    def load(
        cls,
        path: str,
        use_pickle: bool = False,
        tensor_features_to_keep: Optional[Sequence[str]] = None,
    ) -> "SequenceTokenizer":
        """Restore a saved tokenizer; optionally keep a feature subset
        (reference: sequence_tokenizer.py:410)."""
        if use_pickle:
            tokenizer = pickle.loads(Path(path).read_bytes())
        else:
            src = Path(path)
            args = json.loads((src / "init_args.json").read_text())
            schema = pickle.loads((src / "tensor_schema.pkl").read_bytes())
            tokenizer = cls(schema, **args)
            tokenizer._encoder = pickle.loads((src / "encoder.pkl").read_bytes())
        if tensor_features_to_keep is not None:
            tokenizer._tensor_schema = tokenizer._tensor_schema.subset(
                tensor_features_to_keep
            )
        return tokenizer

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

    @property
    def interactions_encoder(self) -> Optional[LabelEncoder]:
        return self._encoder.interactions_encoder

    @property
    def query_features_encoder(self) -> Optional[LabelEncoder]:
        return self._encoder.query_features_encoder

    @property
    def item_features_encoder(self) -> Optional[LabelEncoder]:
        return self._encoder.item_features_encoder
