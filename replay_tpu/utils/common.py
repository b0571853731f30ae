"""Frame conversion + top-k utilities.

TPU-native analog of the reference utility layer (reference:
replay/utils/common.py convert2pandas/convert2polars, load_from_replay;
replay/utils/spark_utils.py — get_top_k :101, get_top_k_recs :156,
sample_top_k_recs :671, filter_cold :724, horizontal_explode :419).
"""

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from replay_tpu.utils.types import POLARS_AVAILABLE


def convert2pandas(df) -> pd.DataFrame:
    """Any supported frame → pandas."""
    if isinstance(df, pd.DataFrame):
        return df
    if POLARS_AVAILABLE:  # pragma: no cover - polars absent in image
        import polars as pl

        if isinstance(df, pl.DataFrame):
            return df.to_pandas()
    msg = f"Unsupported frame type {type(df)}"
    raise TypeError(msg)


def convert2polars(df):  # pragma: no cover - polars absent in image
    if not POLARS_AVAILABLE:
        msg = "polars is not installed"
        raise ImportError(msg)
    import polars as pl

    if isinstance(df, pl.DataFrame):
        return df
    return pl.from_pandas(df)


def get_top_k(
    dataframe: pd.DataFrame,
    partition_by_col: str,
    order_by: List[Tuple[str, bool]],
    k: int,
) -> pd.DataFrame:
    """Top-k rows per partition by arbitrary sort spec (reference:
    spark_utils.py:101).

    :param order_by: list of (column, ascending) pairs.
    """
    cols = [partition_by_col] + [c for c, _ in order_by]
    ascending = [True] + [asc for _, asc in order_by]
    return (
        dataframe.sort_values(cols, ascending=ascending, kind="stable")
        .groupby(partition_by_col, sort=False)
        .head(k)
        .reset_index(drop=True)
    )


def get_top_k_recs(
    recs: pd.DataFrame,
    k: int,
    query_column: str = "query_id",
    rating_column: str = "rating",
    item_column: str = "item_id",
) -> pd.DataFrame:
    """Top-k by rating desc, ties item asc (reference: spark_utils.py:156)."""
    return get_top_k(recs, query_column, [(rating_column, False), (item_column, True)], k)


def sample_top_k_recs(
    recs: pd.DataFrame,
    k: int,
    seed: Optional[int] = None,
    query_column: str = "query_id",
    rating_column: str = "rating",
) -> pd.DataFrame:
    """Sample k items per query with probability ∝ rating (reference:
    spark_utils.py:671) — an exploration-friendly alternative to exact
    top-k."""
    rng = np.random.default_rng(seed)
    out = []
    for _, grp in recs.groupby(query_column, sort=False):
        probs = grp[rating_column].to_numpy(dtype=np.float64)
        probs = np.clip(probs, 0.0, None)
        total = probs.sum()
        take = min(k, len(grp))
        if total <= 0:
            chosen = rng.choice(len(grp), size=take, replace=False)
        else:
            chosen = rng.choice(len(grp), size=take, replace=False, p=probs / total)
        out.append(grp.iloc[chosen])
    return pd.concat(out, ignore_index=True) if out else recs.head(0)


def filter_cold(
    df: Optional[pd.DataFrame],
    warm_df: pd.DataFrame,
    col_name: str,
) -> Tuple[int, Optional[pd.DataFrame]]:
    """Drop rows whose ``col_name`` is absent from ``warm_df`` (reference:
    spark_utils.py:724).  Returns (num_cold, filtered_df)."""
    if df is None:
        return 0, None
    warm = np.unique(warm_df[col_name].to_numpy())
    mask = np.isin(df[col_name].to_numpy(), warm)
    num_cold = int((~mask).sum())
    if num_cold == 0:
        return 0, df
    return num_cold, df[mask]


def horizontal_explode(
    data: pd.DataFrame,
    column_to_explode: str,
    prefix: str,
    other_columns: List[str],
) -> pd.DataFrame:
    """Array column → one column per element, named ``{prefix}_{i}``
    (reference: spark_utils.py:419)."""
    arrays = np.stack(data[column_to_explode].to_numpy())
    exploded = pd.DataFrame(
        arrays, columns=[f"{prefix}_{i}" for i in range(arrays.shape[1])], index=data.index
    )
    return pd.concat([data[other_columns], exploded], axis=1)


def load_from_replay(path: str):
    """Load any saved object (model / splitter / encoder / dataset) by
    inspecting the directory layout (reference: common.py load_from_replay)."""
    target = Path(path)
    if (target / "init_args.json").exists():
        import json

        args = json.loads((target / "init_args.json").read_text())
        if "_model_name" in args:
            from replay_tpu.utils.model_handler import load

            return load(path)
        if "_splitter_name" in args:
            from replay_tpu.utils.model_handler import load_splitter

            return load_splitter(path)
    if (target / "encoder.json").exists() or (target / "rules").exists():
        from replay_tpu.preprocessing import LabelEncoder

        return LabelEncoder.load(path)
    if (target / "dataset.json").exists() or (target / "interactions.parquet").exists():
        from replay_tpu.data.dataset import Dataset

        return Dataset.load(path)
    msg = f"Cannot identify saved object at {path}"
    raise ValueError(msg)


def save_picklable_to_parquet(obj, path: str) -> None:
    """Dump any picklable object as a one-row parquet file with a single
    ``data`` binary column — byte-compatible with the reference's layout so
    artifacts can move between the two frameworks
    (reference: replay/utils/spark_utils.py:789; Spark RDD plumbing replaced
    by a direct single-row frame — same on-disk schema)."""
    import pickle

    pd.DataFrame({"data": [pickle.dumps(obj)]}).to_parquet(path)


def load_pickled_from_parquet(path: str):
    """Inverse of :func:`save_picklable_to_parquet`
    (reference: replay/utils/spark_utils.py:807).

    Only unpickle artifacts you trust — pickle executes code on load."""
    import pickle

    frame = pd.read_parquet(path, columns=["data"])
    return pickle.loads(bytes(frame["data"].iloc[0]))
