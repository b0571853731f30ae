"""Session creation from interaction logs.

TPU-native analog of the reference Sessionizer (reference:
replay/preprocessing/sessionizer.py:11), reproducing its session-id
arithmetic exactly: per-user cumulative user-count minus the cumulative
count of session boundaries (gaps ≥ ``session_gap``), then optional
filtering by interactions-per-session and sessions-per-user.
"""

from typing import Optional

import numpy as np
import pandas as pd


class Sessionizer:
    """Assign session ids by time gaps and filter sessions/users.

    >>> import pandas as pd
    >>> log = pd.DataFrame(
    ...     {"user_id": [1, 1, 1], "item_id": [2, 3, 4],
    ...      "timestamp": [0, 100, 100 + 86400 + 1]})
    >>> Sessionizer().transform(log)["session_id"].tolist()
    [2, 2, 1]
    """

    def __init__(
        self,
        user_column: str = "user_id",
        time_column: str = "timestamp",
        session_column: str = "session_id",
        session_gap: int = 86400,
        time_column_format: str = "yyyy-MM-dd HH:mm:ss",
        min_inter_per_session: Optional[int] = None,
        max_inter_per_session: Optional[int] = None,
        min_sessions_per_user: Optional[int] = None,
        max_sessions_per_user: Optional[int] = None,
    ):
        self.user_column = user_column
        self.time_column = time_column
        self.session_column = session_column
        self.session_gap = session_gap
        self.time_column_format = time_column_format
        self.min_inter_per_session = min_inter_per_session
        self.max_inter_per_session = max_inter_per_session
        self.min_sessions_per_user = min_sessions_per_user
        self.max_sessions_per_user = max_sessions_per_user
        self._sanity_check()

    def _sanity_check(self) -> None:
        if self.min_inter_per_session:
            assert self.min_inter_per_session > 0
        if self.min_sessions_per_user:
            assert self.min_sessions_per_user > 0
        if self.min_inter_per_session and self.max_inter_per_session:
            assert self.min_inter_per_session <= self.max_inter_per_session
        if self.min_sessions_per_user and self.max_sessions_per_user:
            assert self.min_sessions_per_user <= self.max_sessions_per_user

    def _to_unix(self, interactions: pd.DataFrame) -> pd.DataFrame:
        col = interactions[self.time_column]
        if pd.api.types.is_datetime64_any_dtype(col):
            out = interactions.copy()
            # unit-safe: normalize to seconds regardless of datetime64 resolution
            out[self.time_column] = col.astype("datetime64[s]").astype("int64")
            return out
        return interactions

    def transform(self, interactions: pd.DataFrame) -> pd.DataFrame:
        """Add ``session_column`` and apply session/user filters."""
        res = self._to_unix(interactions).copy()

        sorted_res = res.sort_values([self.user_column, self.time_column])
        diff = res[self.time_column] - sorted_res.groupby(self.user_column)[
            self.time_column
        ].shift(1)
        nan_mask = diff.isna()
        boundary = diff >= self.session_gap
        boundary[nan_mask] = True
        res["_boundary"] = boundary
        res["_cum_boundary"] = (
            res.sort_values(
                [self.user_column, self.time_column, "_boundary"],
                ascending=[True, True, False],
            )
            .groupby(self.user_column, sort=False)["_boundary"]
            .cumsum()
        )
        user_count = (
            res.groupby(self.user_column)[self.user_column].count().cumsum().to_frame()
        )
        user_count.rename(columns={self.user_column: "_count"}, inplace=True)
        res = res.join(user_count, how="left", on=self.user_column)
        res[self.session_column] = res["_count"] - res["_cum_boundary"]
        res.drop(columns=["_boundary", "_cum_boundary", "_count"], inplace=True)

        # -------------------------------------------------------- filtering
        counts = res.groupby(self.session_column, sort=False)[self.session_column].transform("count")
        if self.min_inter_per_session:
            res = res[counts >= self.min_inter_per_session]
            counts = counts[counts >= self.min_inter_per_session]
        if self.max_inter_per_session:
            res = res[counts <= self.max_inter_per_session]
        nunique = res.groupby(self.user_column, sort=False)[self.session_column].transform("nunique")
        if self.min_sessions_per_user:
            keep = nunique >= self.min_sessions_per_user
            res, nunique = res[keep], nunique[keep]
        if self.max_sessions_per_user:
            res = res[nunique <= self.max_sessions_per_user]
        return res
