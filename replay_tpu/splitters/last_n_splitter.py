"""Last-N split per user (reference: replay/splitters/last_n_splitter.py:24)."""

from typing import Optional

import numpy as np
import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType

StrategyName = str


class LastNSplitter(Splitter):
    """Test = last N interactions (or last N seconds) per divide_column group.

    >>> import pandas as pd
    >>> df = pd.DataFrame({
    ...     "query_id": [1, 1, 1, 2, 2],
    ...     "item_id": [1, 2, 3, 1, 2],
    ...     "timestamp": [1, 2, 3, 1, 2]})
    >>> train, test = LastNSplitter(N=1, divide_column="query_id").split(df)
    >>> test["item_id"].tolist()
    [3, 2]
    """

    _init_arg_names = [
        "N",
        "divide_column",
        "time_column_format",
        "strategy",
        "drop_cold_users",
        "drop_cold_items",
        "query_column",
        "item_column",
        "timestamp_column",
        "session_id_column",
        "session_id_processing_strategy",
    ]

    def __init__(
        self,
        N: int,  # noqa: N803
        divide_column: str = "query_id",
        time_column_format: str = "yyyy-MM-dd HH:mm:ss",
        strategy: StrategyName = "interactions",
        drop_cold_users: bool = False,
        drop_cold_items: bool = False,
        query_column: str = "query_id",
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        if strategy not in ("interactions", "timedelta"):
            msg = "strategy must be equal 'interactions' or 'timedelta'"
            raise ValueError(msg)
        super().__init__(
            drop_cold_users=drop_cold_users,
            drop_cold_items=drop_cold_items,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        self.N = N
        self.strategy = strategy
        self.divide_column = divide_column
        self.time_column_format = time_column_format if strategy == "timedelta" else None

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        res = interactions.sort_values(
            by=[self.divide_column, self.timestamp_column], kind="stable"
        ).copy()
        if self.strategy == "interactions":
            grp = res.groupby(self.divide_column, sort=False)
            row_num = grp.cumcount() + 1
            count = grp[self.divide_column].transform("size")
            res["is_test"] = row_num > (count - float(self.N))
        else:
            ts = res[self.timestamp_column]
            if pd.api.types.is_datetime64_any_dtype(ts):
                ts = (ts - pd.Timestamp("1970-01-01")) // pd.Timedelta("1s")
            res["_ts"] = ts
            end = res.groupby(self.divide_column, sort=False)["_ts"].transform("max")
            res["is_test"] = res["_ts"] > end - self.N
            res = res.drop(columns=["_ts"])
        if self.session_id_column:
            res = self._recalculate_with_session_id_column(res)
        train = res[~res["is_test"]].drop(columns=["is_test"])
        test = res[res["is_test"]].drop(columns=["is_test"])
        return train, test
