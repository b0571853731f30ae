"""Experimental-tier metric surface (reference:
replay/experimental/metrics/__init__.py).

The reference's experimental tier re-implements every metric against its
legacy Spark/Scala-UDF data plane; here the main metric kernels already run
the single vectorized data plane, so the experimental names resolve to the
same classes (plus the NCIS counterfactual family, which is experimental-
only in the reference — base_metric.py:441)."""

from replay_tpu.metrics import (
    MAP,
    MRR,
    NDCG,
    Coverage,
    Experiment,
    HitRate,
    Metric,
    Precision,
    Recall,
    RocAuc,
    Surprisal,
    Unexpectedness,
)
from replay_tpu.metrics.ncis_precision import NCISMetric, NCISPrecision

__all__ = [
    "Coverage",
    "Experiment",
    "HitRate",
    "MAP",
    "MRR",
    "Metric",
    "NCISMetric",
    "NCISPrecision",
    "NDCG",
    "Precision",
    "Recall",
    "RocAuc",
    "Surprisal",
    "Unexpectedness",
]
