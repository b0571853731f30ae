"""SequenceGenerator: rolling-window sequence builder (reference:
replay/experimental/preprocessing/sequence_generator.py — builds, for each
interaction, the list of the user's preceding items)."""

from typing import List, Optional, Sequence, Union

import pandas as pd


class SequenceGenerator:
    """For every row append the user's previous values as a list column."""

    def __init__(
        self,
        groupby_column: Union[str, Sequence[str]],
        transform_columns: Union[str, Sequence[str], None] = None,
        orderby_column: Optional[str] = None,
        window_size: Optional[int] = None,
        label_prefix: str = "list",
        get_list_len: bool = False,
        len_column: str = "list_len",
    ):
        self.groupby_column = (
            [groupby_column] if isinstance(groupby_column, str) else list(groupby_column)
        )
        self.transform_columns = (
            [transform_columns]
            if isinstance(transform_columns, str)
            else (list(transform_columns) if transform_columns else None)
        )
        self.orderby_column = orderby_column
        self.window_size = window_size
        self.label_prefix = label_prefix
        self.get_list_len = get_list_len
        self.len_column = len_column

    def transform(self, data: pd.DataFrame) -> pd.DataFrame:
        frame = data
        sort_cols = list(self.groupby_column)
        if self.orderby_column:
            sort_cols.append(self.orderby_column)
        frame = frame.sort_values(sort_cols, kind="stable")
        transform_columns = self.transform_columns or [
            c for c in frame.columns if c not in self.groupby_column
        ]
        out = frame.copy()
        for col in transform_columns:
            lists: List[List] = []
            prev_key = None
            history: List = []
            for key, value in zip(
                frame[self.groupby_column].itertuples(index=False, name=None),
                frame[col],
            ):
                if key != prev_key:
                    history = []
                    prev_key = key
                window = history[-self.window_size :] if self.window_size else list(history)
                lists.append(list(window))
                history.append(value)
            out[f"{self.label_prefix}_{col}"] = lists
        if self.get_list_len:
            first = transform_columns[0]
            out[self.len_column] = out[f"{self.label_prefix}_{first}"].apply(len)
        return out
