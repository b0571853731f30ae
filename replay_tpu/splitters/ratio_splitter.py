"""Per-user ratio split (reference: replay/splitters/ratio_splitter.py:13)."""

from typing import Optional

import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class RatioSplitter(Splitter):
    """Split each user's interactions into train/test by time-ordered ratio.

    >>> import pandas as pd
    >>> df = pd.DataFrame({
    ...     "query_id": [1, 1, 1, 1, 2, 2],
    ...     "item_id": [1, 2, 3, 4, 1, 2],
    ...     "timestamp": [1, 2, 3, 4, 1, 2]})
    >>> train, test = RatioSplitter(test_size=0.5).split(df)
    >>> sorted(train["item_id"].tolist())
    [1, 1, 2]
    """

    _init_arg_names = [
        "test_size",
        "divide_column",
        "drop_cold_users",
        "drop_cold_items",
        "query_column",
        "item_column",
        "timestamp_column",
        "min_interactions_per_group",
        "split_by_fractions",
        "session_id_column",
        "session_id_processing_strategy",
    ]

    def __init__(
        self,
        test_size: float,
        divide_column: str = "query_id",
        drop_cold_users: bool = False,
        drop_cold_items: bool = False,
        query_column: str = "query_id",
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
        min_interactions_per_group: Optional[int] = None,
        split_by_fractions: bool = True,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
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
        self.divide_column = divide_column
        self._precision = 3
        self.min_interactions_per_group = min_interactions_per_group
        self.split_by_fractions = split_by_fractions
        if test_size < 0 or test_size > 1:
            msg = "test_size must between 0 and 1"
            raise ValueError(msg)
        self.test_size = test_size

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        res = interactions.sort_values(
            by=[self.divide_column, self.timestamp_column], kind="stable"
        ).copy()
        grp = res.groupby(self.divide_column, sort=False)
        res["_row_num"] = grp.cumcount() + 1
        res["_count"] = grp[self.divide_column].transform("size")

        if self.split_by_fractions:
            train_size = round(1 - self.test_size, self._precision)
            frac = (res["_row_num"] / res["_count"]).round(self._precision)
            if self.min_interactions_per_group is not None:
                frac = frac.where(res["_count"] >= self.min_interactions_per_group, 0)
            res["is_test"] = frac > train_size
        else:
            train_count = (res["_count"] - (res["_count"] * self.test_size).astype(int)).astype(int)
            if self.min_interactions_per_group is not None:
                train_count = train_count.where(
                    res["_count"] >= self.min_interactions_per_group, res["_count"]
                )
            else:
                # reference guarantee (ratio_splitter.py:303-311): a group too
                # small for even one floor-rounded test row (0 < count·ratio
                # < 1) still contributes exactly one, as long as that leaves
                # ≥1 train row
                scaled = res["_count"] * self.test_size
                force_one = (scaled > 0) & (scaled < 1) & (train_count > 1)
                train_count = train_count.where(~force_one, train_count - 1)
            res["is_test"] = res["_row_num"] > train_count

        if self.session_id_column:
            res = self._recalculate_with_session_id_column(res)

        drop_cols = ["_row_num", "_count", "is_test"]
        train = res[~res["is_test"]].drop(columns=drop_cols)
        test = res[res["is_test"]].drop(columns=drop_cols)
        return train, test
