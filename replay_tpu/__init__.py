"""replay_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
sb-ai-lab/RePlay: data schema & preprocessing, train/test splitting, a model
zoo (classical JAX models + neural sequential models), offline metrics,
hyperparameter search, and production serving paths — built for TPU device
meshes rather than Spark clusters.

Top-level conveniences are lazy so ``import replay_tpu`` stays light::

    from replay_tpu import Dataset, FeatureSchema
    from replay_tpu.models import ItemKNN, ALSWrap
    from replay_tpu.nn.sequential import SasRec
"""

from typing import Any

__version__ = "0.1.0"

_LAZY = {
    "Dataset": ("replay_tpu.data.dataset", "Dataset"),
    "FeatureSchema": ("replay_tpu.data.schema", "FeatureSchema"),
    "FeatureInfo": ("replay_tpu.data.schema", "FeatureInfo"),
    "FeatureType": ("replay_tpu.data.schema", "FeatureType"),
    "FeatureHint": ("replay_tpu.data.schema", "FeatureHint"),
    "FeatureSource": ("replay_tpu.data.schema", "FeatureSource"),
    "TensorSchema": ("replay_tpu.data.nn.schema", "TensorSchema"),
    "Experiment": ("replay_tpu.metrics.experiment", "Experiment"),
    "OfflineMetrics": ("replay_tpu.metrics.offline_metrics", "OfflineMetrics"),
}


def __getattr__(name: str) -> Any:
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    msg = f"module {__name__!r} has no attribute {name!r}"
    raise AttributeError(msg)
