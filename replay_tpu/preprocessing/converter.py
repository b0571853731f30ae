"""Interaction frame → scipy CSR matrix (reference:
replay/preprocessing/converter.py:10 CSRConverter)."""

from typing import Optional

import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix


class CSRConverter:
    """Build ``csr_matrix[first_dim, second_dim] = data`` from a dataframe."""

    def __init__(
        self,
        first_dim_column: str,
        second_dim_column: str,
        data_column: Optional[str] = None,
        row_count: Optional[int] = None,
        column_count: Optional[int] = None,
        allow_collect_to_master: bool = False,  # noqa: ARG002 — reference
        # Spark knob (replay/preprocessing/converter.py:10); host-local here
    ):
        self.first_dim_column = first_dim_column
        self.second_dim_column = second_dim_column
        self.data_column = data_column
        self.row_count = row_count
        self.column_count = column_count

    def transform(self, data: pd.DataFrame) -> csr_matrix:
        rows = data[self.first_dim_column].to_numpy()
        cols = data[self.second_dim_column].to_numpy()
        values = (
            data[self.data_column].to_numpy()
            if self.data_column is not None
            else np.ones(len(data))
        )

        def _max(arr):
            return int(arr.max()) if len(arr) else 0

        n_rows = self.row_count if self.row_count is not None else _max(rows) + 1
        n_cols = self.column_count if self.column_count is not None else _max(cols) + 1
        return csr_matrix((values, (rows, cols)), shape=(n_rows, n_cols))
