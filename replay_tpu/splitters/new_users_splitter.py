"""New-users split (reference: replay/splitters/new_users_splitter.py:12)."""

from typing import Optional

import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class NewUsersSplitter(Splitter):
    """Test = all interactions of the latest-arriving ``test_size`` share of users."""

    _init_arg_names = [
        "test_size",
        "drop_cold_items",
        "query_column",
        "item_column",
        "timestamp_column",
        "session_id_column",
        "session_id_processing_strategy",
    ]

    def __init__(
        self,
        test_size: float,
        drop_cold_items: bool = False,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: Optional[str] = "timestamp",
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        if test_size < 0 or test_size > 1:
            msg = "test_size must between 0 and 1"
            raise ValueError(msg)
        self.test_size = test_size

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        start_by_user = (
            interactions.groupby(self.query_column)[self.timestamp_column].min().rename("_start")
        )
        per_date = start_by_user.value_counts().sort_index(ascending=False)
        cum_users = per_date.cumsum()
        total = per_date.sum()
        eligible = cum_users[cum_users >= self.test_size * total]
        test_start = eligible.index.max()

        train = interactions[interactions[self.timestamp_column] < test_start]
        test_users = start_by_user[start_by_user >= test_start].index
        test = interactions[interactions[self.query_column].isin(test_users)]

        if self.session_id_column:
            marked = interactions.copy()
            marked["is_test"] = False
            marked.loc[test.index, "is_test"] = True
            marked = self._recalculate_with_session_id_column(marked)
            train = marked[~marked["is_test"]].drop(columns=["is_test"])
            test = marked[marked["is_test"]].drop(columns=["is_test"])
        return train, test
