"""Import-path compatibility: the reference's old-stack prediction/validation
callbacks live at ``replay.models.nn.sequential.callbacks`` (reference:
replay/models/nn/sequential/callbacks/{prediction_callbacks,validation_callback}.py).
Canonical implementations: :mod:`replay_tpu.nn.callbacks`.
"""

from replay_tpu.nn.callbacks import (
    PandasPredictionCallback,
    PolarsPredictionCallback,
    QueryEmbeddingsCallback,
    SparkPredictionCallback,
    TopKPredictionsCallback,
    TorchPredictionCallback,
    ValidationMetricsCallback,
)

BasePredictionCallback = TopKPredictionsCallback
QueryEmbeddingsPredictionCallback = QueryEmbeddingsCallback

__all__ = [
    "BasePredictionCallback",
    "PandasPredictionCallback",
    "PolarsPredictionCallback",
    "QueryEmbeddingsPredictionCallback",
    "SparkPredictionCallback",
    "TorchPredictionCallback",
    "ValidationMetricsCallback",
]
