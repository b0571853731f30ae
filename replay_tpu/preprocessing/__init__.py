"""Preprocessing: encoders, filters, discretizer, sessionizer (reference: replay/preprocessing/)."""

from replay_tpu.preprocessing.filters import (
    ConsecutiveDuplicatesFilter,
    EntityDaysFilter,
    GlobalDaysFilter,
    InteractionEntriesFilter,
    LowRatingFilter,
    MinCountFilter,
    NumInteractionsFilter,
    QuantileItemsFilter,
    TimePeriodFilter,
    filter_cold,
)
from replay_tpu.preprocessing.label_encoder import (
    LabelEncoder,
    LabelEncoderPartialFitWarning,
    LabelEncoderTransformWarning,
    LabelEncodingRule,
    SequenceEncodingRule,
)

__all__ = [
    "ConsecutiveDuplicatesFilter",
    "EntityDaysFilter",
    "GlobalDaysFilter",
    "InteractionEntriesFilter",
    "LabelEncoder",
    "LabelEncoderPartialFitWarning",
    "LabelEncoderTransformWarning",
    "LabelEncodingRule",
    "LowRatingFilter",
    "MinCountFilter",
    "NumInteractionsFilter",
    "QuantileItemsFilter",
    "SequenceEncodingRule",
    "TimePeriodFilter",
    "filter_cold",
]
