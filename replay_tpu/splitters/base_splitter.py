"""Splitter base class.

Mirrors the reference contract (reference: replay/splitters/base_splitter.py:25)
— cold-user/item dropping, session-boundary handling, and ``.replay`` save/load
— on a single pandas code path.
"""

import json
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional, Tuple

import pandas as pd

SplitterReturnType = Tuple[pd.DataFrame, pd.DataFrame]


class Splitter(ABC):
    """Base class for train/test splitters."""

    _init_arg_names = [
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
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: Optional[str] = "timestamp",
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        self.drop_cold_users = drop_cold_users
        self.drop_cold_items = drop_cold_items
        self.query_column = query_column
        self.item_column = item_column
        self.timestamp_column = timestamp_column
        self.session_id_column = session_id_column
        self.session_id_processing_strategy = session_id_processing_strategy

    @property
    def _init_args(self):
        return {name: getattr(self, name) for name in self._init_arg_names}

    def save(self, path: str) -> None:
        base_path = Path(path).with_suffix(".replay").resolve()
        base_path.mkdir(parents=True, exist_ok=True)
        payload = {"init_args": self._init_args, "_class_name": str(self)}
        with open(base_path / "init_args.json", "w") as file:
            json.dump(payload, file)

    @classmethod
    def load(cls, path: str, **kwargs) -> "Splitter":
        base_path = Path(path).with_suffix(".replay").resolve()
        with open(base_path / "init_args.json") as file:
            payload = json.load(file)
        return cls(**payload["init_args"])

    def __str__(self):
        return type(self).__name__

    def _drop_cold_items_and_users(self, train: pd.DataFrame, test: pd.DataFrame) -> pd.DataFrame:
        if self.drop_cold_items:
            test = test[test[self.item_column].isin(train[self.item_column].unique())]
        if self.drop_cold_users:
            test = test[test[self.query_column].isin(train[self.query_column].unique())]
        return test

    @abstractmethod
    def _core_split(self, interactions: pd.DataFrame) -> SplitterReturnType: ...

    def split(self, interactions: pd.DataFrame) -> SplitterReturnType:
        """Split interactions into (train, test)."""
        train, test = self._core_split(interactions)
        test = self._drop_cold_items_and_users(train, test)
        return train, test

    def _recalculate_with_session_id_column(self, data: pd.DataFrame) -> pd.DataFrame:
        """Force whole sessions to one side of the boundary via first/last is_test."""
        agg = "first" if self.session_id_processing_strategy == "train" else "last"
        res = data.copy()
        res["is_test"] = res.groupby([self.query_column, self.session_id_column])["is_test"].transform(agg)
        return res
