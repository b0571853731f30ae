"""Random-cut next-N split (reference: replay/splitters/random_next_n_splitter.py:20)."""

from typing import Optional

import numpy as np
import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType


class RandomNextNSplitter(Splitter):
    """Sample a random cut per group; test = the next N interactions after the cut."""

    _init_arg_names = [
        "N",
        "divide_column",
        "seed",
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
        N: Optional[int] = 1,  # noqa: N803
        divide_column: str = "query_id",
        seed: Optional[int] = None,
        query_column: str = "query_id",
        drop_cold_users: bool = False,
        drop_cold_items: bool = False,
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
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
        if N is not None and N < 1:
            msg = "N must be >= 1"
            raise ValueError(msg)
        self.N = N
        self.divide_column = divide_column
        self.seed = seed

    def _sample_cuts(self, counts: np.ndarray) -> np.ndarray:
        rng = np.random.RandomState(self.seed)
        return rng.randint(0, counts)

    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        df = interactions.sort_values([self.divide_column, self.timestamp_column], kind="stable").copy()
        df["_event_rank"] = df.groupby(self.divide_column, sort=False).cumcount()

        counts = df.groupby(self.divide_column, sort=False).size()
        cuts = pd.Series(self._sample_cuts(counts.values), index=counts.index)
        df["_cut_index"] = df[self.divide_column].map(cuts)

        if self.N is not None:
            df = df[df["_event_rank"] < df["_cut_index"] + self.N]

        df["is_test"] = df["_event_rank"] >= df["_cut_index"]
        if self.session_id_column:
            df = self._recalculate_with_session_id_column(df)

        train = df[~df["is_test"]][interactions.columns]
        test = df[df["is_test"]][interactions.columns]
        return train, test
