"""DataPreparator: legacy column-renaming preparation (reference:
replay/experimental/preprocessing/data_preparator.py — renames arbitrary
log columns to the canonical (query, item, timestamp, rating) layout and
fills defaults)."""

from typing import Dict, Optional

import pandas as pd


class DataPreparator:
    """Map raw column names onto the canonical interaction schema."""

    def __init__(
        self,
        columns_mapping: Dict[str, str],
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        timestamp_column: str = "timestamp",
        default_rating: float = 1.0,
    ):
        """
        :param columns_mapping: canonical name → source column, e.g.
            ``{"query_id": "user", "item_id": "movie", "rating": "stars"}``.
        """
        self.columns_mapping = columns_mapping
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self.timestamp_column = timestamp_column
        self.default_rating = default_rating

    def transform(self, data: pd.DataFrame) -> pd.DataFrame:
        missing = [src for src in self.columns_mapping.values() if src not in data.columns]
        if missing:
            msg = f"Columns {missing} not found in the input frame"
            raise ValueError(msg)
        out = data.rename(columns={src: dst for dst, src in self.columns_mapping.items()})
        for required in (self.query_column, self.item_column):
            if required not in out.columns:
                msg = f"columns_mapping must provide '{required}'"
                raise ValueError(msg)
        if self.rating_column not in out.columns:
            out[self.rating_column] = self.default_rating
        if self.timestamp_column not in out.columns:
            out[self.timestamp_column] = range(len(out))
        canonical = [
            self.query_column,
            self.item_column,
            self.timestamp_column,
            self.rating_column,
        ]
        rest = [c for c in out.columns if c not in canonical]
        return out[canonical + rest]
