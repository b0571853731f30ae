"""Preprocessing helpers (reference: replay/preprocessing/utils.py:132
merge_subsets)."""

import logging
from typing import Optional, Sequence

import pandas as pd


def merge_subsets(
    dfs: Sequence[pd.DataFrame],
    columns: Optional[Sequence[str]] = None,
    check_columns: bool = True,
    subset_for_duplicates: Optional[Sequence[str]] = None,
    on_duplicate: str = "error",
) -> pd.DataFrame:
    """Re-merge split parts into one frame with duplicate handling.

    :param on_duplicate: ``error`` | ``drop`` | ``ignore``.
    """
    if not dfs:
        msg = "At least one dataframe is required"
        raise ValueError(msg)
    if any(not isinstance(df, type(dfs[0])) for df in dfs):
        msg = "All input dataframes must be of the same type"
        raise TypeError(msg)
    if on_duplicate not in ("error", "drop", "ignore"):
        msg = f"Unknown on_duplicate: {on_duplicate}"
        raise ValueError(msg)

    ref_cols = list(dfs[0].columns) if columns is None else list(columns)
    parts = []
    for i, df in enumerate(dfs):
        if check_columns and set(df.columns) != set(ref_cols):
            msg = f"Dataframe {i} columns {list(df.columns)} do not match {ref_cols}"
            raise ValueError(msg)
        parts.append(df[ref_cols])
    merged = pd.concat(parts, ignore_index=True)

    if on_duplicate == "ignore":
        return merged
    dup_subset = ref_cols if subset_for_duplicates is None else list(subset_for_duplicates)
    duplicated = merged.duplicated(subset=dup_subset)
    if on_duplicate == "error":
        if duplicated.any():
            msg = f"Found duplicate rows on subset {dup_subset}"
            raise ValueError(msg)
        return merged
    n_dup = int(duplicated.sum())
    if n_dup:
        logging.getLogger("replay_tpu").warning(
            "Found %s duplicate rows on subset %s and dropped them", n_dup, dup_subset
        )
    return merged[~duplicated].reset_index(drop=True)
