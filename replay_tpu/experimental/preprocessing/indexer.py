"""Legacy Indexer: arbitrary ids ↔ contiguous numeric idx.

TPU-native analog of the reference's Spark ``Indexer`` (reference:
replay/experimental/preprocessing/data_preparator.py:33) — the pre-
``LabelEncoder`` id-mapping utility the experimental tier's models consume.
The StringIndexer/IndexToString pair becomes two numpy mapping arrays; like
the reference's ``_reindex``, ``transform`` extends the mapping in place
when it meets unseen ids (reference: data_preparator.py:146-176).
"""

from typing import Optional

import numpy as np
import pandas as pd


class Indexer:
    """Convert raw ``user_col``/``item_col`` ids to numerical
    ``user_idx``/``item_idx`` and back."""

    suffix = "inner"

    def __init__(self, user_col: str = "user_id", item_col: str = "item_id"):
        self.user_col = user_col
        self.item_col = item_col
        self.user_labels: Optional[np.ndarray] = None
        self.item_labels: Optional[np.ndarray] = None
        self.user_type = None
        self.item_type = None

    @property
    def _init_args(self):
        return {"user_col": self.user_col, "item_col": self.item_col}

    def fit(self, users: pd.DataFrame, items: pd.DataFrame) -> None:
        """Build the id→idx mappings from the distinct values of
        ``users[user_col]`` and ``items[item_col]``."""
        self.user_type = users[self.user_col].dtype
        self.item_type = items[self.item_col].dtype
        self.user_labels = pd.unique(users[self.user_col].to_numpy())
        self.item_labels = pd.unique(items[self.item_col].to_numpy())

    def _reindex(self, values: np.ndarray, entity: str) -> None:
        labels = getattr(self, f"{entity}_labels")
        new = pd.unique(values[~pd.Series(values).isin(labels).to_numpy()])
        if len(new):
            setattr(self, f"{entity}_labels", np.concatenate([labels, new]))

    def _codes(self, values: np.ndarray, entity: str) -> np.ndarray:
        labels = getattr(self, f"{entity}_labels")
        mapping = pd.Series(np.arange(len(labels), dtype=np.int64), index=labels)
        return mapping.loc[values].to_numpy()

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        """Replace raw id columns with ``user_idx``/``item_idx`` int columns,
        growing the mapping for previously unseen ids."""
        out = df.copy()
        if self.item_col in out.columns:
            vals = out[self.item_col].to_numpy()
            self._reindex(vals, "item")
            out["item_idx"] = self._codes(vals, "item").astype(np.int32)
            out = out.drop(columns=[self.item_col])
        if self.user_col in out.columns:
            vals = out[self.user_col].to_numpy()
            self._reindex(vals, "user")
            out["user_idx"] = self._codes(vals, "user").astype(np.int32)
            out = out.drop(columns=[self.user_col])
        return out

    def inverse_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        """Restore the original id columns (and dtypes) from idx columns."""
        out = df.copy()
        if "item_idx" in out.columns:
            out[self.item_col] = pd.Series(
                self.item_labels[out["item_idx"].to_numpy()]
            ).astype(self.item_type).to_numpy()
            out = out.drop(columns=["item_idx"])
        if "user_idx" in out.columns:
            out[self.user_col] = pd.Series(
                self.user_labels[out["user_idx"].to_numpy()]
            ).astype(self.user_type).to_numpy()
            out = out.drop(columns=["user_idx"])
        return out
