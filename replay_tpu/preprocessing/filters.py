"""Interaction filters.

Single vectorized pandas implementation of the reference's 10 filters
(reference: replay/preprocessing/filters.py:26-1221 — which implements each
filter three times for pandas/polars/spark).  Semantics match the reference;
docstring examples double as doctests.
"""

from abc import ABC, abstractmethod
from datetime import datetime, timedelta
from typing import Callable, List, Literal, Optional, Union
from uuid import uuid4

import numpy as np
import pandas as pd


class _BaseFilter(ABC):
    """A filter transforms an interactions dataframe into a filtered one."""

    def transform(self, interactions: pd.DataFrame) -> pd.DataFrame:
        r"""Filter the interactions dataframe."""
        return self._filter(interactions)

    @abstractmethod
    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame: ...


class InteractionEntriesFilter(_BaseFilter):
    """Iteratively remove users/items whose interaction count is out of bounds.

    >>> import pandas as pd
    >>> interactions = pd.DataFrame({
    ...    "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 3, 3],
    ...    "item_id": [3, 7, 10, 5, 8, 11, 4, 9, 2, 5],
    ...    "rating": [1, 2, 3, 3, 2, 1, 3, 12, 1, 4]})
    >>> InteractionEntriesFilter(min_inter_per_user=4).transform(interactions)
       user_id  item_id  rating
    6        3        4       3
    7        3        9      12
    8        3        2       1
    9        3        5       4
    """

    def __init__(
        self,
        query_column: str = "user_id",
        item_column: str = "item_id",
        min_inter_per_user: Optional[int] = None,
        max_inter_per_user: Optional[int] = None,
        min_inter_per_item: Optional[int] = None,
        max_inter_per_item: Optional[int] = None,
        allow_caching: bool = True,
    ):
        self.query_column = query_column
        self.item_column = item_column
        self.min_inter_per_user = min_inter_per_user
        self.max_inter_per_user = max_inter_per_user
        self.min_inter_per_item = min_inter_per_item
        self.max_inter_per_item = max_inter_per_item
        self.allow_caching = allow_caching
        if self.min_inter_per_user is not None:
            assert self.min_inter_per_user > 0
        if self.min_inter_per_item is not None:
            assert self.min_inter_per_item > 0
        if self.min_inter_per_user and self.max_inter_per_user:
            assert self.min_inter_per_user < self.max_inter_per_user
        if self.min_inter_per_item and self.max_inter_per_item:
            assert self.min_inter_per_item < self.max_inter_per_item

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        dropped = [True, True]
        which = 0
        while dropped[0] or dropped[1]:
            if which == 0:
                lo, hi, col = self.min_inter_per_user, self.max_inter_per_user, self.query_column
            else:
                lo, hi, col = self.min_inter_per_item, self.max_inter_per_item, self.item_column
            if lo is None and hi is None:
                dropped[which] = False
            else:
                before = len(interactions)
                counts = interactions.groupby(col, sort=False)[col].transform("size")
                keep = pd.Series(True, index=interactions.index)
                if lo:
                    keep &= counts >= lo
                if hi:
                    keep &= counts <= hi
                interactions = interactions[keep]
                dropped[which] = len(interactions) != before
            which = 1 - which
        return interactions


class MinCountFilter(_BaseFilter):
    """Keep rows whose groupby_column value appears at least num_entries times.

    >>> import pandas as pd
    >>> MinCountFilter(2).transform(pd.DataFrame({"user_id": [1, 1, 2]}))
       user_id
    0        1
    1        1
    """

    def __init__(self, num_entries: int, groupby_column: str = "user_id"):
        assert num_entries > 0
        self.num_entries = num_entries
        self.groupby_column = groupby_column

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        counts = interactions.groupby(self.groupby_column)[self.groupby_column].transform("size")
        return interactions[counts >= self.num_entries]


class LowRatingFilter(_BaseFilter):
    """Keep rows with rating >= value.

    >>> import pandas as pd
    >>> LowRatingFilter(3.5).transform(pd.DataFrame({"rating": [1, 5, 3.5, 4]}))
       rating
    1     5.0
    2     3.5
    3     4.0
    """

    def __init__(self, value: float, rating_column: str = "rating"):
        self.value = value
        self.rating_column = rating_column

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        return interactions[interactions[self.rating_column] >= self.value]


class NumInteractionsFilter(_BaseFilter):
    """Keep the first/last ``num_interactions`` interactions per query."""

    def __init__(
        self,
        num_interactions: int = 10,
        first: bool = True,
        query_column: str = "user_id",
        timestamp_column: str = "timestamp",
        item_column: Optional[str] = None,
    ):
        assert num_interactions >= 0
        self.num_interactions = num_interactions
        self.first = first
        self.query_column = query_column
        self.timestamp_column = timestamp_column
        self.item_column = item_column

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [self.timestamp_column]
        if self.item_column is not None:
            sort_cols.append(self.item_column)
        ascending = [self.first] * len(sort_cols)
        rank = (
            interactions.sort_values(sort_cols, ascending=ascending, kind="stable")
            .groupby(self.query_column)
            .cumcount()
            .reindex(interactions.index)
        )
        return interactions[rank < self.num_interactions]


def _days_window(ts: pd.Series, days: int):
    """A ``days``-wide window in the column's own time unit: Timedelta for
    datetime columns, seconds for the framework's canonical int-seconds
    timestamps (reference only documents the datetime case)."""
    if pd.api.types.is_datetime64_any_dtype(ts):
        return pd.Timedelta(days=days)
    return days * 86400


class EntityDaysFilter(_BaseFilter):
    """Keep the first/last ``days`` of interactions per entity."""

    def __init__(
        self,
        days: int = 10,
        first: bool = True,
        entity_column: str = "user_id",
        timestamp_column: str = "timestamp",
    ):
        assert days > 0
        self.days = days
        self.first = first
        self.entity_column = entity_column
        self.timestamp_column = timestamp_column

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        ts = interactions[self.timestamp_column]
        window = _days_window(ts, self.days)
        if self.first:
            start = interactions.groupby(self.entity_column)[self.timestamp_column].transform("min")
            return interactions[ts < start + window]
        end = interactions.groupby(self.entity_column)[self.timestamp_column].transform("max")
        return interactions[ts > end - window]


class GlobalDaysFilter(_BaseFilter):
    """Keep the globally first/last ``days`` of interactions."""

    def __init__(self, days: int = 10, first: bool = True, timestamp_column: str = "timestamp"):
        assert days > 0
        self.days = days
        self.first = first
        self.timestamp_column = timestamp_column

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        ts = interactions[self.timestamp_column]
        if ts.empty:
            return interactions
        window = _days_window(ts, self.days)
        if self.first:
            return interactions[ts < ts.min() + window]
        return interactions[ts > ts.max() - window]


class TimePeriodFilter(_BaseFilter):
    """Keep interactions within [start_date, end_date)."""

    def __init__(
        self,
        start_date: Optional[Union[str, datetime]] = None,
        end_date: Optional[Union[str, datetime]] = None,
        timestamp_column: str = "timestamp",
        time_column_format: str = "%Y-%m-%d %H:%M:%S",
    ):
        self.start_date = self._parse(start_date, time_column_format)
        self.end_date = self._parse(end_date, time_column_format)
        self.timestamp_column = timestamp_column

    @staticmethod
    def _parse(date, fmt):
        if isinstance(date, str):
            return datetime.strptime(date, fmt)
        return date

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        ts = interactions[self.timestamp_column]
        mask = pd.Series(True, index=interactions.index)
        if self.start_date is not None:
            mask &= ts >= self.start_date
        if self.end_date is not None:
            mask &= ts < self.end_date
        return interactions[mask]


class QuantileItemsFilter(_BaseFilter):
    """Undersample interactions of items above the alpha_quantile popularity.

    For every item whose interaction count exceeds the quantile threshold,
    remove ``items_proportion`` of the excess interactions (those belonging to
    the most active users first), preserving relative item popularity.
    """

    def __init__(
        self,
        alpha_quantile: float = 0.99,
        items_proportion: float = 0.5,
        query_column: str = "query_id",
        item_column: str = "item_id",
    ) -> None:
        if not 0 < alpha_quantile < 1:
            msg = "`alpha_quantile` value must be in (0, 1)"
            raise ValueError(msg)
        if not 0 < items_proportion < 1:
            msg = "`items_proportion` value must be in (0, 1)"
            raise ValueError(msg)
        self.alpha_quantile = alpha_quantile
        self.items_proportion = items_proportion
        self.query_column = query_column
        self.item_column = item_column

    def _filter(self, df: pd.DataFrame) -> pd.DataFrame:
        item_counts = df.groupby(self.item_column).size()
        user_counts = df.groupby(self.query_column).size()
        threshold = item_counts.quantile(self.alpha_quantile, interpolation="midpoint")

        counts_items = df[self.item_column].map(item_counts)
        counts_users = df[self.query_column].map(user_counts)

        long_tail_mask = counts_items <= threshold
        long_tail = df[long_tail_mask]
        short = df[~long_tail_mask].copy()
        if short.empty:
            return df
        max_long_count = int(counts_items[long_tail_mask].max()) if long_tail_mask.any() else 0
        short["_n_del"] = (
            self.items_proportion * (counts_items[~long_tail_mask] - max_long_count)
        ).astype(int)
        short["_cu"] = counts_users[~long_tail_mask]
        # default (unstable) sort kind on purpose: WHICH tied-activity rows
        # get undersampled is the observable contract, and the reference's
        # tie order comes from numpy's introsort (same rationale as KFolds)
        short = short.sort_values("_cu", ascending=False)
        rank = short.groupby(self.item_column).cumcount()
        kept_short = short[rank >= short["_n_del"]].drop(columns=["_n_del", "_cu"])
        return pd.concat([long_tail, kept_short])


class ConsecutiveDuplicatesFilter(_BaseFilter):
    """Drop consecutive repeats of the same item within a user's timeline."""

    def __init__(
        self,
        keep: Literal["first", "last"] = "first",
        query_column: str = "query_id",
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
    ) -> None:
        if keep not in ("first", "last"):
            msg = "`keep` must be either 'first' or 'last'"
            raise ValueError(msg)
        self.query_column = query_column
        self.item_column = item_column
        self.timestamp_column = timestamp_column
        self.bias = 1 if keep == "first" else -1

    def _filter(self, interactions: pd.DataFrame) -> pd.DataFrame:
        ordered = interactions.sort_values(self.timestamp_column, kind="stable")
        prev = ordered.groupby(self.query_column)[self.item_column].shift(periods=self.bias)
        keep_mask = (ordered[self.item_column] != prev) | prev.isna()
        return ordered[keep_mask].reset_index(drop=True)


def filter_cold(
    target: pd.DataFrame,
    reference: pd.DataFrame,
    mode: Literal["items", "users", "both"] = "items",
    query_column: str = "query_id",
    item_column: str = "item_id",
) -> pd.DataFrame:
    """Keep rows of ``target`` whose ids also appear in ``reference``."""
    if mode not in {"items", "users", "both"}:
        msg = "mode must be 'items' | 'users' | 'both'"
        raise ValueError(msg)
    columns = {
        "items": [item_column],
        "users": [query_column],
        "both": [query_column, item_column],
    }[mode]
    for column in columns:
        if column not in target.columns or column not in reference.columns:
            msg = f"Column '{column}' must be in both dataframes"
            raise KeyError(msg)
    for column in columns:
        allowed = reference[column].unique()
        target = target[target[column].isin(allowed)]
    return target
