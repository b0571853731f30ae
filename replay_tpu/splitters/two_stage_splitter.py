"""Two-stage split: sample users, then items per user
(reference: replay/splitters/two_stage_splitter.py:17)."""

from typing import Optional, Union

import numpy as np
import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class TwoStageSplitter(Splitter):
    """Choose ``first_divide_size`` users, then move ``second_divide_size``
    (fraction or count) of their most recent (or random) interactions to test."""

    _init_arg_names = [
        "first_divide_size",
        "second_divide_size",
        "first_divide_column",
        "second_divide_column",
        "shuffle",
        "drop_cold_users",
        "drop_cold_items",
        "seed",
        "query_column",
        "item_column",
        "timestamp_column",
    ]

    def __init__(
        self,
        first_divide_size: Union[float, int],
        second_divide_size: Union[float, int],
        first_divide_column: str = "query_id",
        second_divide_column: str = "item_id",
        shuffle: bool = False,
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: Optional[str] = "timestamp",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
        )
        self.first_divide_column = first_divide_column
        self.second_divide_column = second_divide_column
        self.first_divide_size = first_divide_size
        self.second_divide_size = second_divide_size
        self.shuffle = shuffle
        self.seed = seed

    def _get_test_values(self, interactions: pd.DataFrame) -> pd.DataFrame:
        all_values = pd.DataFrame(
            np.sort(interactions[self.first_divide_column].unique()),
            columns=[self.first_divide_column],
        )
        user_count = len(all_values)
        if isinstance(self.first_divide_size, int):
            if not 1 <= self.first_divide_size < user_count:
                msg = f"Invalid value for user_test_size: {self.first_divide_size}"
                raise ValueError(msg)
            test_user_count = self.first_divide_size
        else:
            if not 0 < self.first_divide_size < 1:
                msg = f"Invalid value for user_test_size: {self.first_divide_size}"
                raise ValueError(msg)
            test_user_count = user_count * self.first_divide_size
        return all_values.sample(n=int(test_user_count), random_state=self.seed)

    def _add_partition(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.shuffle:
            # default (unstable) sort kind on purpose: which items land in
            # test for a given seed is the observable contract, and the
            # reference's within-group order after this sort comes from
            # numpy's introsort (same rationale as KFolds)
            res = df.sample(frac=1, random_state=self.seed).sort_values(
                self.first_divide_column
            )
        else:
            res = df.sort_values(
                [self.first_divide_column, self.timestamp_column],
                ascending=[True, False],
                kind="stable",
            )
        res = res.copy()
        res["_row_num"] = res.groupby(self.first_divide_column, sort=False).cumcount() + 1
        return res

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        size = self.second_divide_size
        if not ((0 <= size < 1.0) or (size >= 1 and isinstance(size, int))):
            msg = f"`test_size` value must be [0, 1) or a positive integer; test_size={size}"
            raise ValueError(msg)

        test_users = self._get_test_values(interactions)
        test_users = test_users.copy()
        test_users["is_test"] = True
        res = self._add_partition(
            interactions.merge(test_users, how="left", on=self.first_divide_column)
        )
        res["is_test"] = res["is_test"].fillna(False).astype(bool)

        if 0 <= size < 1.0:
            count = res.groupby(self.first_divide_column)[self.first_divide_column].transform("size")
            frac = res["_row_num"] / count
            in_test = (frac <= size) & res["is_test"]
        else:
            in_test = (res["_row_num"] <= size) & res["is_test"]

        drop_cols = ["_row_num", "is_test"]
        train = res[~in_test].drop(columns=drop_cols)
        test = res[in_test].drop(columns=drop_cols)
        return train, test
