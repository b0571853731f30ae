"""Preprocessing: encoders, filters, discretizer, sessionizer (reference: replay/preprocessing/)."""

from replay_tpu.preprocessing.converter import CSRConverter
from replay_tpu.preprocessing.discretizer import (
    Discretizer,
    GreedyDiscretizingRule,
    HandleInvalidStrategies,
    QuantileDiscretizingRule,
)
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
from replay_tpu.preprocessing.history_based_fp import (
    ConditionalPopularityProcessor,
    EmptyFeatureProcessor,
    HistoryBasedFeaturesProcessor,
    LogStatFeaturesProcessor,
)
from replay_tpu.preprocessing.sessionizer import Sessionizer
from replay_tpu.preprocessing.utils import merge_subsets
from replay_tpu.preprocessing.label_encoder import (
    LabelEncoder,
    LabelEncoderPartialFitWarning,
    LabelEncoderTransformWarning,
    LabelEncodingRule,
    SequenceEncodingRule,
)

__all__ = [
    "CSRConverter",
    "ConsecutiveDuplicatesFilter",
    "Discretizer",
    "GreedyDiscretizingRule",
    "QuantileDiscretizingRule",
    "ConditionalPopularityProcessor",
    "EmptyFeatureProcessor",
    "HandleInvalidStrategies",
    "HistoryBasedFeaturesProcessor",
    "LogStatFeaturesProcessor",
    "Sessionizer",
    "merge_subsets",
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
