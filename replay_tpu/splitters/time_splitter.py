"""Global time-threshold split (reference: replay/splitters/time_splitter.py:20)."""

from datetime import datetime
from typing import Optional, Union

import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class TimeSplitter(Splitter):
    """Test = interactions at/after a time threshold (datetime or global ratio).

    >>> import pandas as pd
    >>> log = pd.DataFrame(
    ...     {"query_id": [1, 1, 2, 2], "item_id": [3, 4, 5, 6],
    ...      "timestamp": [10, 20, 10, 30]})
    >>> train, test = TimeSplitter(0.5, drop_cold_users=False,
    ...                            drop_cold_items=False).split(log)
    >>> sorted(test["timestamp"].tolist())
    [20, 30]
    """

    _init_arg_names = [
        "time_threshold",
        "drop_cold_users",
        "drop_cold_items",
        "query_column",
        "item_column",
        "timestamp_column",
        "session_id_column",
        "session_id_processing_strategy",
        "time_column_format",
    ]

    def __init__(
        self,
        time_threshold: Union[datetime, str, int, float],
        query_column: str = "query_id",
        drop_cold_users: bool = False,
        drop_cold_items: bool = False,
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
        time_column_format: str = "%Y-%m-%d %H:%M:%S",
    ):
        super().__init__(
            drop_cold_users=drop_cold_users,
            drop_cold_items=drop_cold_items,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        self.time_column_format = time_column_format
        if isinstance(time_threshold, float) and (time_threshold < 0 or time_threshold > 1):
            msg = "time_threshold must be between 0 and 1"
            raise ValueError(msg)
        self.time_threshold = time_threshold

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        threshold = self.time_threshold
        if isinstance(threshold, str):
            threshold = datetime.strptime(threshold, self.time_column_format)
        res = interactions.copy()
        if res.empty:
            return res, res.copy()
        if isinstance(threshold, float):
            # reference sorts in place before the session recalculation
            # (time_splitter.py:171), so session first/last = earliest/latest
            # in TIME, not in input order
            res = res.sort_values(self.timestamp_column, kind="stable")
            test_start_idx = int(len(res) * (1 - threshold))
            test_start = res.iloc[test_start_idx][self.timestamp_column]
            res["is_test"] = res[self.timestamp_column] >= test_start
        else:
            res["is_test"] = res[self.timestamp_column] >= threshold
        if self.session_id_column:
            res = self._recalculate_with_session_id_column(res)
        train = res[~res["is_test"]].drop(columns=["is_test"])
        test = res[res["is_test"]].drop(columns=["is_test"])
        return train, test
