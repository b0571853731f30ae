"""DatasetLabelEncoder: encode a whole Dataset's categorical columns.

TPU-native analog of the reference (reference:
replay/data/dataset_utils/dataset_label_encoder.py:20).  Fits one
LabelEncodingRule (SequenceEncodingRule for list columns) per categorical
feature, choosing the fitting frame by the feature's hint/source, and
returns an encoded Dataset with ``categorical_encoded=True``.
"""

import warnings
from typing import Dict, Iterable, Optional, Sequence, Union

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import FeatureHint, FeatureSchema, FeatureSource, FeatureType
from replay_tpu.preprocessing.label_encoder import (
    LabelEncoder,
    LabelEncoderTransformWarning,
    LabelEncodingRule,
    SequenceEncodingRule,
)


class DatasetLabelEncoder:
    """Fit/transform all categorical columns of a Dataset."""

    def __init__(
        self,
        handle_unknown_rule: str = "error",
        default_value_rule: Optional[Union[int, str]] = None,
    ) -> None:
        self._handle_unknown_rule = handle_unknown_rule
        self._default_value_rule = default_value_rule
        self._encoding_rules: Dict[str, LabelEncodingRule] = {}
        self._features_columns: Dict[Union[FeatureHint, FeatureSource], Sequence[str]] = {}

    # ------------------------------------------------------------------- fit
    def fit(self, dataset: Dataset) -> "DatasetLabelEncoder":
        self._fill_features_columns(dataset.feature_schema)
        for column, info in dataset.feature_schema.categorical_features.items():
            rule_cls = (
                SequenceEncodingRule
                if info.feature_type == FeatureType.CATEGORICAL_LIST
                else LabelEncodingRule
            )
            rule = rule_cls(
                column,
                handle_unknown=self._handle_unknown_rule,
                default_value=self._default_value_rule,
            )
            if info.feature_hint == FeatureHint.QUERY_ID:
                frame = (
                    dataset.query_features
                    if dataset.query_features is not None
                    else dataset.interactions
                )
            elif info.feature_hint == FeatureHint.ITEM_ID:
                frame = (
                    dataset.item_features
                    if dataset.item_features is not None
                    else dataset.interactions
                )
            elif info.feature_source == FeatureSource.QUERY_FEATURES:
                frame = dataset.query_features
            elif info.feature_source == FeatureSource.ITEM_FEATURES:
                frame = dataset.item_features
            else:
                frame = dataset.interactions
            rule.fit(frame)
            self._encoding_rules[column] = rule
        return self

    # -------------------------------------------------------------- transform
    def transform(self, dataset: Dataset) -> Dataset:
        self._check_if_initialized()
        interactions = dataset.interactions
        query_features = dataset.query_features
        item_features = dataset.item_features

        for column, info in dataset.feature_schema.categorical_features.items():
            if column not in self._encoding_rules:
                warnings.warn(
                    f"Cannot transform feature '{column}' as it was not present at the fit stage",
                    LabelEncoderTransformWarning,
                )
                continue
            rule = self._encoding_rules[column]
            if info.feature_hint == FeatureHint.QUERY_ID:
                interactions = rule.transform(interactions)
                if query_features is not None:
                    query_features = rule.transform(query_features)
            elif info.feature_hint == FeatureHint.ITEM_ID:
                interactions = rule.transform(interactions)
                if item_features is not None:
                    item_features = rule.transform(item_features)
            elif info.feature_source == FeatureSource.QUERY_FEATURES:
                query_features = rule.transform(query_features)
            elif info.feature_source == FeatureSource.ITEM_FEATURES:
                item_features = rule.transform(item_features)
            else:
                interactions = rule.transform(interactions)

        return Dataset(
            feature_schema=dataset.feature_schema,
            interactions=interactions,
            query_features=query_features,
            item_features=item_features,
            check_consistency=False,
            categorical_encoded=True,
        )

    def fit_transform(self, dataset: Dataset) -> Dataset:
        return self.fit(dataset).transform(dataset)

    # -------------------------------------------------------------- accessors
    def get_encoder(self, columns: Union[str, Iterable[str]]) -> Optional[LabelEncoder]:
        if isinstance(columns, str):
            columns = [columns]
        rules = [self._encoding_rules[c] for c in columns if c in self._encoding_rules]
        if not rules:
            return None
        encoder = LabelEncoder(rules)
        return encoder

    @property
    def query_id_encoder(self) -> LabelEncoder:
        self._check_if_initialized()
        return self.get_encoder(self._features_columns[FeatureHint.QUERY_ID])

    @property
    def item_id_encoder(self) -> LabelEncoder:
        self._check_if_initialized()
        return self.get_encoder(self._features_columns[FeatureHint.ITEM_ID])

    @property
    def query_and_item_id_encoder(self) -> LabelEncoder:
        self._check_if_initialized()
        columns = list(self._features_columns[FeatureHint.QUERY_ID]) + list(
            self._features_columns[FeatureHint.ITEM_ID]
        )
        return self.get_encoder(columns)

    @property
    def interactions_encoder(self) -> Optional[LabelEncoder]:
        self._check_if_initialized()
        return self.get_encoder(self._features_columns[FeatureSource.INTERACTIONS])

    @property
    def query_features_encoder(self) -> Optional[LabelEncoder]:
        self._check_if_initialized()
        return self.get_encoder(self._features_columns[FeatureSource.QUERY_FEATURES])

    @property
    def item_features_encoder(self) -> Optional[LabelEncoder]:
        self._check_if_initialized()
        return self.get_encoder(self._features_columns[FeatureSource.ITEM_FEATURES])

    # ---------------------------------------------------------------- helpers
    def _check_if_initialized(self) -> None:
        if not self._encoding_rules:
            msg = "Encoder is not initialized; call fit() first"
            raise RuntimeError(msg)

    def _fill_features_columns(self, schema: FeatureSchema) -> None:
        self._features_columns = {
            FeatureHint.QUERY_ID: [schema.query_id_column],
            FeatureHint.ITEM_ID: [schema.item_id_column],
            FeatureSource.INTERACTIONS: [
                f.column
                for f in schema.categorical_features.all_features
                if f.feature_source == FeatureSource.INTERACTIONS and f.feature_hint is None
            ],
            FeatureSource.QUERY_FEATURES: [
                f.column
                for f in schema.categorical_features.all_features
                if f.feature_source == FeatureSource.QUERY_FEATURES and f.feature_hint is None
            ],
            FeatureSource.ITEM_FEATURES: [
                f.column
                for f in schema.categorical_features.all_features
                if f.feature_source == FeatureSource.ITEM_FEATURES and f.feature_hint is None
            ],
        }
