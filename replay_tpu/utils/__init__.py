"""Runtime utilities (reference: replay/utils/)."""

from replay_tpu.utils.types import (
    JAX_AVAILABLE,
    OPTUNA_AVAILABLE,
    POLARS_AVAILABLE,
    PYARROW_AVAILABLE,
    TORCH_AVAILABLE,
    DataFrameLike,
    MissingImport,
    PandasDataFrame,
    PolarsDataFrame,
)

__all__ = [
    "DataFrameLike",
    "JAX_AVAILABLE",
    "MissingImport",
    "OPTUNA_AVAILABLE",
    "POLARS_AVAILABLE",
    "PYARROW_AVAILABLE",
    "PandasDataFrame",
    "PolarsDataFrame",
    "TORCH_AVAILABLE",
]
