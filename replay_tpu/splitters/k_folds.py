"""K-fold per-query split generator (reference: replay/splitters/k_folds.py:16)."""

from typing import Iterator, Optional

import pandas as pd

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType

StrategyName = str


class KFolds(Splitter):
    """Yield (train, test) pairs, splitting each query's rows into folds at random."""

    _init_arg_names = [
        "n_folds",
        "strategy",
        "drop_cold_users",
        "drop_cold_items",
        "seed",
        "query_column",
        "item_column",
        "timestamp_column",
        "session_id_column",
        "session_id_processing_strategy",
    ]

    def __init__(
        self,
        n_folds: Optional[int] = 5,
        strategy: Optional[StrategyName] = "query",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: Optional[str] = "timestamp",
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        self.n_folds = n_folds
        if strategy not in {"query"}:
            msg = f"Wrong splitter parameter: {strategy}"
            raise ValueError(msg)
        self.strategy = strategy
        self.seed = seed

    def split(self, interactions: pd.DataFrame) -> Iterator[SplitterReturnType]:
        return self._core_split(interactions)

    def _core_split(self, interactions: pd.DataFrame) -> Iterator[SplitterReturnType]:
        # default (unstable quicksort) sort kind on purpose: fold membership
        # for a given seed is the observable contract, and the reference's
        # tie order within a query group comes from numpy's introsort — a
        # stable sort here would assign different folds for the same seed
        df = interactions.sample(frac=1, random_state=self.seed).sort_values(
            self.query_column
        )
        df = df.copy()
        df["_fold"] = (df.groupby(self.query_column, sort=False).cumcount() + 1) % self.n_folds
        for i in range(self.n_folds):
            df["is_test"] = df["_fold"] == i
            fold_df = df
            if self.session_id_column:
                fold_df = self._recalculate_with_session_id_column(fold_df)
            train = fold_df[~fold_df["is_test"]].drop(columns=["is_test", "_fold"])
            test = fold_df[fold_df["is_test"]].drop(columns=["is_test", "_fold"])
            test = self._drop_cold_items_and_users(train, test)
            yield train, test
