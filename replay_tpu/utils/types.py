"""Runtime type flags and the DataFrameLike union.

TPU-native analog of the reference's conditional-import machinery
(reference: replay/utils/types.py:1-51).  Where the reference gates on
pyspark/torch/openvino, we gate on the libraries relevant to the TPU stack:
polars (optional CPU data plane), torch (optional interop), optuna (optional
HPO backend — a built-in random/TPE-lite sampler is always available).
"""

from importlib.util import find_spec
from typing import Iterable, Union

import numpy as np
import pandas as pd


class FeatureUnavailableError(Exception):
    """A requested feature's optional backend is unavailable
    (reference: replay/utils/types.py:15)."""


class FeatureUnavailableWarning(Warning):
    """A requested feature silently degrades because its optional backend
    is unavailable (reference: replay/utils/types.py:19)."""


class MissingImport:
    """Placeholder class for a conditionally unavailable dependency.

    Any attempt to instantiate or use it raises a clear ImportError.
    """

    _module_name = "<unknown>"

    def __init__(self, *args, **kwargs):  # pragma: no cover - trivial
        raise ImportError(
            f"Optional dependency '{self._module_name}' is not installed; "
            "this feature is unavailable."
        )


def _missing(name: str):
    return type(f"Missing_{name}", (MissingImport,), {"_module_name": name})


POLARS_AVAILABLE = find_spec("polars") is not None
TORCH_AVAILABLE = find_spec("torch") is not None
OPTUNA_AVAILABLE = find_spec("optuna") is not None
PYARROW_AVAILABLE = find_spec("pyarrow") is not None
JAX_AVAILABLE = find_spec("jax") is not None

# Reference-named flags (replay/utils/types.py:22-33) mapped onto the TPU
# stack's equivalents so conditional user code ports unchanged:
PYSPARK_AVAILABLE = False  # no Spark engine — mesh/jit is the data plane
ANN_AVAILABLE = True  # in-tree C++ HNSW (replay_tpu/ann/native)
OPENVINO_AVAILABLE = JAX_AVAILABLE  # compiled serving = StableHLO AOT export
LIGHTFM_AVAILABLE = find_spec("lightfm") is not None
OBP_AVAILABLE = find_spec("obp") is not None

PandasDataFrame = pd.DataFrame

if POLARS_AVAILABLE:  # pragma: no cover - polars absent in CI image
    import polars as _pl

    PolarsDataFrame = _pl.DataFrame
else:
    PolarsDataFrame = _missing("polars")

if POLARS_AVAILABLE:  # pragma: no cover
    DataFrameLike = Union[PandasDataFrame, PolarsDataFrame]
else:
    DataFrameLike = PandasDataFrame

# Alias kept for API familiarity with the reference's SparkDataFrame users.
SparkDataFrame = _missing("pyspark")
IntOrList = Union[int, Iterable[int]]
NumType = Union[int, float]


def is_pandas(df) -> bool:
    return isinstance(df, pd.DataFrame)


def is_polars(df) -> bool:
    return POLARS_AVAILABLE and isinstance(df, PolarsDataFrame)


def to_numpy_1d(col) -> np.ndarray:
    """Column (pandas Series / polars Series / ndarray / list) -> 1-D ndarray."""
    if isinstance(col, np.ndarray):
        return col
    if hasattr(col, "to_numpy"):
        return col.to_numpy()
    return np.asarray(col)
