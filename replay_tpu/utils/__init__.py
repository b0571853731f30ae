"""Runtime utilities (reference: replay/utils/)."""

from replay_tpu.utils.common import (
    convert2pandas,
    filter_cold,
    get_top_k,
    get_top_k_recs,
    horizontal_explode,
    load_from_replay,
    sample_top_k_recs,
)
from replay_tpu.utils.distributions import item_distribution
from replay_tpu.utils.model_handler import (
    load,
    load_encoder,
    load_splitter,
    save,
    save_encoder,
    save_splitter,
)
from replay_tpu.utils.time import get_item_recency, smoothe_time
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
    "convert2pandas",
    "filter_cold",
    "get_item_recency",
    "get_top_k",
    "get_top_k_recs",
    "horizontal_explode",
    "load_from_replay",
    "sample_top_k_recs",
    "item_distribution",
    "load",
    "load_encoder",
    "load_splitter",
    "save",
    "save_encoder",
    "save_splitter",
    "smoothe_time",
]
