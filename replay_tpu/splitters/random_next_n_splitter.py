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
        # Run-length formulation: after the (divide, timestamp) sort every group
        # is one contiguous run, so per-row rank and per-row cut come from
        # np.repeat over the run boundaries — no scratch columns needed.  The
        # cut RNG sequence (RandomState(seed).randint(0, counts) over groups in
        # sorted-key order) matches the reference, so splits are frame-identical.
        ordered = interactions.sort_values([self.divide_column, self.timestamp_column], kind="stable")
        keys = ordered[self.divide_column].to_numpy()
        n = len(keys)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) if n else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, n])
        cut_per_row = np.repeat(self._sample_cuts(counts), counts)
        rank = np.arange(n) - np.repeat(starts, counts)

        test_flag = rank >= cut_per_row
        if self.N is not None:
            window = rank < cut_per_row + self.N
            ordered = ordered[window]
            test_flag = test_flag[window]
        if self.session_id_column:
            test_flag = self._recalculate_with_session_id_column(
                ordered.assign(is_test=test_flag)
            )["is_test"].to_numpy()

        train = ordered[~test_flag][interactions.columns]
        test = ordered[test_flag][interactions.columns]
        return train, test
