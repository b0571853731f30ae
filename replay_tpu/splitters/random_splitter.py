"""Uniform random row split (reference: replay/splitters/random_splitter.py:6)."""

from typing import Optional

import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class RandomSplitter(Splitter):
    """Assign rows to train/test uniformly at random."""

    _init_arg_names = [
        "test_size",
        "drop_cold_users",
        "drop_cold_items",
        "seed",
        "query_column",
        "item_column",
    ]

    def __init__(
        self,
        test_size: float,
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: str = "item_id",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
        )
        self.seed = seed
        if test_size < 0 or test_size > 1:
            msg = "test_size must between 0 and 1"
            raise ValueError(msg)
        self.test_size = test_size

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        train = interactions.sample(frac=(1 - self.test_size), random_state=self.seed)
        test = interactions.drop(train.index)
        return train, test
