"""Offline metrics (reference: replay/metrics/)."""

from replay_tpu.metrics.base_metric import (
    Metric,
    MetricDuplicatesWarning,
    MetricsDataFrameLike,
    MetricsMeanReturnType,
    MetricsPerUserReturnType,
    MetricsReturnType,
)
from replay_tpu.metrics.categorical_diversity import CategoricalDiversity
from replay_tpu.metrics.coverage import Coverage
from replay_tpu.metrics.descriptors import (
    CalculationDescriptor,
    ConfidenceInterval,
    Mean,
    Median,
    PerUser,
)
from replay_tpu.metrics.experiment import Experiment
from replay_tpu.metrics.builder import MetricsBuilder, metrics_to_df
from replay_tpu.metrics.ncis_precision import NCISMetric, NCISPrecision
from replay_tpu.metrics.novelty import Novelty
from replay_tpu.metrics.offline_metrics import OfflineMetrics
from replay_tpu.metrics.ranking import MAP, MRR, NDCG, HitRate, Precision, Recall, RocAuc
from replay_tpu.metrics.surprisal import Surprisal
from replay_tpu.metrics.unexpectedness import Unexpectedness

__all__ = [
    "CalculationDescriptor",
    "CategoricalDiversity",
    "ConfidenceInterval",
    "Coverage",
    "Experiment",
    "HitRate",
    "MAP",
    "MRR",
    "Mean",
    "Median",
    "Metric",
    "MetricDuplicatesWarning",
    "MetricsDataFrameLike",
    "MetricsMeanReturnType",
    "MetricsPerUserReturnType",
    "MetricsReturnType",
    "NDCG",
    "MetricsBuilder",
    "NCISMetric",
    "NCISPrecision",
    "metrics_to_df",
    "Novelty",
    "OfflineMetrics",
    "PerUser",
    "Precision",
    "Recall",
    "RocAuc",
    "Surprisal",
    "Unexpectedness",
]
