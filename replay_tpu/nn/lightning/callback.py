"""Import-path compatibility: the reference exposes prediction/validation
callbacks at ``replay.nn.lightning.callback`` (reference:
replay/nn/lightning/callback/{metrics_callback,predictions_callback}.py).
Canonical implementations: :mod:`replay_tpu.nn.callbacks`.

Name mapping (reference -> replay_tpu):

- ``TopItemsCallbackBase``      -> :class:`TopKPredictionsCallback`
- ``{Pandas,Polars,Torch,Spark}TopItemsCallback`` -> same-format presets
  (``Torch`` returns host arrays; ``Spark`` streams parquet — the frame a
  Spark reader would consume)
- ``ComputeMetricsCallback``    -> :class:`ValidationMetricsCallback`
- ``HiddenStatesCallback``      -> :class:`QueryEmbeddingsCallback` (the
  reference's callback accumulates final hidden states per query; ours
  accumulates the same last-position query embedding)
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

TopItemsCallbackBase = TopKPredictionsCallback
PandasTopItemsCallback = PandasPredictionCallback
PolarsTopItemsCallback = PolarsPredictionCallback
TorchTopItemsCallback = TorchPredictionCallback
SparkTopItemsCallback = SparkPredictionCallback
ComputeMetricsCallback = ValidationMetricsCallback
HiddenStatesCallback = QueryEmbeddingsCallback

__all__ = [
    "ComputeMetricsCallback",
    "HiddenStatesCallback",
    "PandasTopItemsCallback",
    "PolarsTopItemsCallback",
    "SparkTopItemsCallback",
    "TopItemsCallbackBase",
    "TorchTopItemsCallback",
]
