"""Time smoothing: item recency weights (reference: replay/utils/time.py:10
get_item_recency, :114 smoothe_time).

Weights are calibrated so an interaction aged ``decay`` days has weight 0.5:
``power``: (age+1)^c, ``exp``: c^age, ``linear``: 1 − c·age; clipped below
at ``limit``.  Pandas implementation of the same math.
"""

from typing import Union

import numpy as np
import pandas as pd

_DAY_SECS = 86400


def _to_unix_seconds(col: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(col):
        return col.astype("datetime64[s]").astype("int64")
    if pd.api.types.is_numeric_dtype(col):
        return col.astype("int64")
    return pd.to_datetime(col).astype("datetime64[s]").astype("int64")


def smoothe_time(
    log: pd.DataFrame,
    decay: float = 30,
    limit: float = 0.1,
    kind: str = "exp",
    timestamp_column: str = "timestamp",
    rating_column: str = "relevance",
) -> pd.DataFrame:
    """Weight ratings by interaction age (reference: time.py:114)."""
    out = log.copy()
    ts = _to_unix_seconds(out[timestamp_column])
    age = (ts.max() - ts) / _DAY_SECS
    if kind == "power":
        power = np.log(0.5) / np.log(decay)
        weight = np.power(age + 1, power)
    elif kind == "exp":
        base = np.exp(np.log(0.5) / decay)
        weight = np.power(base, age)
    elif kind == "linear":
        weight = 1 - (0.5 / decay) * age
    else:
        msg = f"parameter kind must be one of [power, exp, linear], got {kind}"
        raise ValueError(msg)
    weight = np.maximum(weight, limit)
    out[rating_column] = out[rating_column] * weight
    out[timestamp_column] = pd.to_datetime(ts, unit="s")
    return out


def get_item_recency(
    log: pd.DataFrame,
    decay: float = 30,
    limit: float = 0.1,
    kind: str = "exp",
    item_column: str = "item_idx",
    timestamp_column: str = "timestamp",
    rating_column: str = "relevance",
) -> pd.DataFrame:
    """Per-item recency weight from the mean interaction timestamp
    (reference: time.py:10)."""
    ts = _to_unix_seconds(log[timestamp_column])
    items = (
        pd.DataFrame({item_column: log[item_column], timestamp_column: ts})
        .groupby(item_column, as_index=False)[timestamp_column]
        .mean()
    )
    items[rating_column] = 1.0
    return smoothe_time(
        items,
        decay,
        limit,
        kind,
        timestamp_column=timestamp_column,
        rating_column=rating_column,
    )
