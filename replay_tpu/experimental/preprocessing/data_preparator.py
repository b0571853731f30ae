"""DataPreparator: legacy log/feature-frame preparation (reference:
replay/experimental/preprocessing/data_preparator.py:~440 DataPreparator).

Reads a frame (or a csv/parquet/json file), validates the column mapping,
renames the mapped columns onto the canonical legacy layout
``[user_id, item_id, timestamp, relevance]`` (a mapping with both id keys
is treated as an interactions log; with one id key, as a user/item feature
frame), fills the absent log columns with defaults, and coerces
``relevance`` to float and ``timestamp`` to datetime.
"""

import logging
from typing import Dict, Optional

import pandas as pd

LOG_COLUMNS = ["user_id", "item_id", "timestamp", "relevance"]


class DataPreparator:
    """Prepare raw frames/files into the canonical legacy layout.

    >>> import pandas as pd
    >>> log = pd.DataFrame({"user": [1, 1, 2], "movie": [3, 4, 5]})
    >>> DataPreparator().transform(
    ...     columns_mapping={"user_id": "user", "item_id": "movie"}, data=log
    ... ).columns.tolist()
    ['user_id', 'item_id', 'timestamp', 'relevance']
    """

    DEFAULT_RELEVANCE = 1.0
    DEFAULT_TS = "2099-01-01"

    def __init__(self, columns_mapping: Optional[Dict[str, str]] = None):
        # the legacy replay_tpu surface accepted the mapping at init time;
        # the reference passes it to transform() — both are supported
        self.columns_mapping = columns_mapping
        self.logger = logging.getLogger("replay_tpu")

    # -- readers ------------------------------------------------------------
    @staticmethod
    def read_as_pandas_df(
        data=None,
        path: Optional[str] = None,
        format_type: Optional[str] = None,
        **kwargs,
    ) -> pd.DataFrame:
        """reference read_as_spark_df (:479) with pandas readers."""
        if data is not None:
            return pd.DataFrame(data) if not isinstance(data, pd.DataFrame) else data
        if path and format_type:
            readers = {
                "csv": pd.read_csv,
                "parquet": pd.read_parquet,
                "json": pd.read_json,
            }
            if format_type not in readers:
                msg = f"Invalid value of format_type='{format_type}'"
                raise ValueError(msg)
            return readers[format_type](path, **kwargs)
        msg = "Either data or path parameters must not be None"
        raise ValueError(msg)

    # -- validation ----------------------------------------------------------
    def check_df(self, dataframe: pd.DataFrame, columns_mapping: Dict[str, str]) -> None:
        """Reference check_df (:515): empty / absent columns raise; nulls,
        absent log columns and non-numeric relevance only warn."""
        if len(dataframe) == 0:
            msg = "DataFrame is empty"
            raise ValueError(msg)
        for value in columns_mapping.values():
            if value not in dataframe.columns:
                msg = f"Column `{value}` stated in mapping is absent in dataframe"
                raise ValueError(msg)
        for column in columns_mapping.values():
            if dataframe[column].isna().any():
                self.logger.info(
                    "Column `%s` has NULL values. Handle NULL values before "
                    "the next data preprocessing/model training steps",
                    column,
                )
        if "user_id" in columns_mapping and "item_id" in columns_mapping:
            absent = set(LOG_COLUMNS).difference(columns_mapping.keys())
            if absent:
                self.logger.info(
                    "Columns %s are absent, but may be required for models "
                    "training. They will be filled with defaults.",
                    sorted(absent),
                )
        if "relevance" in columns_mapping and not pd.api.types.is_numeric_dtype(
            dataframe[columns_mapping["relevance"]]
        ):
            self.logger.info(
                "Relevance column `%s` should be numeric",
                columns_mapping["relevance"],
            )

    @classmethod
    def add_absent_log_cols(
        cls,
        dataframe: pd.DataFrame,
        columns_mapping: Dict[str, str],
        default_relevance: float = DEFAULT_RELEVANCE,
        default_ts: str = DEFAULT_TS,
    ) -> pd.DataFrame:
        """Fill missing ``relevance``/``timestamp`` with the reference
        defaults (1.0 / 2099-01-01, data_preparator.py:570)."""
        absent = set(LOG_COLUMNS).difference(columns_mapping.keys())
        out = dataframe
        if "relevance" in absent:
            out = out.copy()
            out["relevance"] = float(default_relevance)
        if "timestamp" in absent:
            out = out if out is not dataframe else out.copy()
            out["timestamp"] = pd.Timestamp(default_ts)
        return out

    @staticmethod
    def _rename(df: pd.DataFrame, mapping: Dict[str, str]) -> pd.DataFrame:
        return df.rename(columns={src: dst for dst, src in mapping.items()})

    # -- main entry ------------------------------------------------------
    def transform(
        self,
        columns_mapping: Optional[Dict[str, str]] = None,
        data=None,
        path: Optional[str] = None,
        format_type: Optional[str] = None,
        date_format: Optional[str] = None,
        reader_kwargs: Optional[dict] = None,
    ) -> pd.DataFrame:
        """Prepare a log or feature frame (reference transform :607).

        Accepts either the reference call shape
        ``transform(columns_mapping, data=...)`` or the legacy replay_tpu
        shape ``DataPreparator(mapping).transform(frame)``.
        """
        if isinstance(columns_mapping, pd.DataFrame):  # legacy positional frame
            data, columns_mapping = columns_mapping, None
        if columns_mapping is None:
            columns_mapping = self.columns_mapping
        if columns_mapping is None:
            msg = "columns_mapping must be provided"
            raise ValueError(msg)
        # legacy replay_tpu mappings used the new-stack key names
        columns_mapping = {
            {"query_id": "user_id", "rating": "relevance"}.get(k, k): v
            for k, v in columns_mapping.items()
        }

        is_log = "user_id" in columns_mapping and "item_id" in columns_mapping
        if "user_id" not in columns_mapping and "item_id" not in columns_mapping:
            msg = "Mapping either for user ids or for item ids is not stated in `columns_mapping`"
            raise ValueError(msg)

        frame = self.read_as_pandas_df(
            data=data, path=path, format_type=format_type, **(reader_kwargs or {})
        )
        self.check_df(frame, columns_mapping=columns_mapping)
        frame = self._rename(frame, columns_mapping)
        if is_log:
            frame = self.add_absent_log_cols(frame, columns_mapping)
            frame = frame.copy()
            frame["relevance"] = frame["relevance"].astype(float)
            if not pd.api.types.is_datetime64_any_dtype(frame["timestamp"]):
                if pd.api.types.is_numeric_dtype(frame["timestamp"]):
                    frame["timestamp"] = pd.to_datetime(frame["timestamp"], unit="s")
                else:
                    frame["timestamp"] = pd.to_datetime(
                        frame["timestamp"], format=date_format
                    )
            canonical = [c for c in LOG_COLUMNS if c in frame.columns]
            rest = [c for c in frame.columns if c not in canonical]
            frame = frame[canonical + rest]
        return frame
