"""Cold-user random split (reference: replay/splitters/cold_user_random_splitter.py:17)."""

from typing import Optional

import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class ColdUserRandomSplitter(Splitter):
    """Test = all interactions of a random ``test_size`` share of users."""

    _init_arg_names = [
        "test_size",
        "drop_cold_items",
        "seed",
        "query_column",
        "item_column",
    ]

    def __init__(
        self,
        test_size: float,
        drop_cold_items: bool = False,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            query_column=query_column,
            item_column=item_column,
        )
        self.seed = seed
        if test_size <= 0 or test_size >= 1:
            msg = "test_size must between 0 and 1"
            raise ValueError(msg)
        self.test_size = test_size

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        users = pd.DataFrame({self.query_column: interactions[self.query_column].unique()})
        train_users = users.sample(frac=(1 - self.test_size), random_state=self.seed)[
            self.query_column
        ]
        is_train = interactions[self.query_column].isin(train_users)
        train = interactions[is_train]
        test = interactions[~is_train]
        return train, test
