"""Padder: pad list columns to a fixed length (reference:
replay/experimental/preprocessing/padder.py)."""

from typing import List, Optional, Sequence, Union

import numpy as np
import pandas as pd


class Padder:
    """Pad (or cut) array columns to ``array_size`` elements."""

    def __init__(
        self,
        pad_columns: Union[str, Sequence[str]],
        padding_side: str = "right",
        padding_value: Union[int, float, Sequence] = 0,
        array_size: int = 10,
        cut_array: bool = True,
        cut_side: str = "right",
    ):
        if padding_side not in ("left", "right"):
            msg = "padding_side must be 'left' or 'right'"
            raise ValueError(msg)
        if cut_side not in ("left", "right"):
            msg = "cut_side must be 'left' or 'right'"
            raise ValueError(msg)
        if array_size <= 0:
            msg = "array_size must be positive"
            raise ValueError(msg)
        self.pad_columns = [pad_columns] if isinstance(pad_columns, str) else list(pad_columns)
        self.padding_side = padding_side
        self.padding_value = padding_value
        self.array_size = array_size
        self.cut_array = cut_array
        self.cut_side = cut_side

    def _pad_one(self, seq, pad_value) -> List:
        seq = list(seq)
        if len(seq) > self.array_size:
            if not self.cut_array:
                return seq
            seq = seq[-self.array_size :] if self.cut_side == "right" else seq[: self.array_size]
        fill = [pad_value] * (self.array_size - len(seq))
        return fill + seq if self.padding_side == "left" else seq + fill

    def transform(self, data: pd.DataFrame) -> pd.DataFrame:
        out = data.copy()
        values = (
            self.padding_value
            if isinstance(self.padding_value, (list, tuple))
            else [self.padding_value] * len(self.pad_columns)
        )
        for col, val in zip(self.pad_columns, values):
            if col not in out.columns:
                msg = f"Column {col} not found"
                raise ValueError(msg)
            out[col] = out[col].apply(lambda s, v=val: self._pad_one(s, v))
        return out
