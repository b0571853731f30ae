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
        if array_size <= 0 and array_size != -1:
            msg = "array_size must be positive (or -1 to pad to the longest array)"
            raise ValueError(msg)
        self.pad_columns = [pad_columns] if isinstance(pad_columns, str) else list(pad_columns)
        self.padding_side = padding_side
        self.padding_value = padding_value
        self.array_size = array_size
        self.cut_array = cut_array
        self.cut_side = cut_side

    def _pad_one(self, seq, pad_value, size: int) -> List:
        # non-list cells become empty arrays (reference padder.py:160)
        seq = list(seq) if isinstance(seq, (list, tuple, np.ndarray)) else []
        if len(seq) > size and self.cut_array:
            # cut_side "right" keeps the TAIL (the reference's right_cut slice)
            seq = seq[-size:] if self.cut_side == "right" else seq[:size]
        fill = [pad_value] * max(0, size - len(seq))
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
                msg = f"Column {col} not in DataFrame columns."
                raise ValueError(msg)
            if self.array_size == -1:
                # robust to non-list cells (they pad as empty arrays, same
                # tolerance as _pad_one) and to all-invalid columns
                lengths = out[col].apply(
                    lambda v: len(v) if isinstance(v, (list, tuple, np.ndarray)) else 0
                )
                size = int(lengths.max()) if len(lengths) else 0
            else:
                size = self.array_size
            out[col] = out[col].apply(lambda s, v=val, z=size: self._pad_one(s, v, z))
        return out
