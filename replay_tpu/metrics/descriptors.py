"""Metric aggregation descriptors (reference: replay/metrics/descriptors.py:35-121)."""

from abc import abstractmethod
from typing import Any

import numpy as np
from scipy.stats import norm, sem


class CalculationDescriptor:
    """Strategy for aggregating a per-user metric distribution."""

    @property
    def __name__(self) -> str:
        return str(self.__class__.__name__)

    @abstractmethod
    def cpu(self, distribution: np.ndarray) -> Any: ...

    def spark(self, distribution: Any) -> Any:
        """Reference API surface (descriptors.py:23): aggregation over a Spark
        column of per-user values.  There is no Spark engine here — a frame
        with a ``toPandas`` method is collected and the single cpu
        implementation is used (the math is backend-independent)."""
        if hasattr(distribution, "toPandas"):  # pragma: no cover - pyspark absent
            distribution = distribution.toPandas().iloc[:, -1].to_numpy()
        return self.cpu(np.asarray(distribution))


class Mean(CalculationDescriptor):
    """Average over users."""

    def cpu(self, distribution: np.ndarray):
        return float(np.mean(distribution))


class PerUser(CalculationDescriptor):
    """Return the raw per-user distribution."""

    def cpu(self, distribution: np.ndarray):
        return distribution


class Median(CalculationDescriptor):
    """Median over users."""

    def cpu(self, distribution: np.ndarray):
        return float(np.median(distribution))


class ConfidenceInterval(CalculationDescriptor):
    """Half-width of the normal confidence interval of the user mean."""

    def __init__(self, alpha: float):
        self.alpha = alpha

    def cpu(self, distribution: np.ndarray):
        quantile = norm.ppf((1 + self.alpha) / 2)
        return float(quantile * sem(distribution))
