"""Per-column shape/padding declarations for parquet batches.

TPU-native analog of the reference metadata layer (reference:
replay/data/nn/parquet/metadata/metadata.py and impl/masking.py:9-20).
Each declared column yields a fixed-shape array; ragged list columns are
padded to the declared length and accompanied by a ``{col}_mask`` validity
array — the reference's mask naming convention, which maps directly onto
the static-shape requirement of jit.
"""

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np


def mask_name(column: str) -> str:
    """Validity-mask column name (reference: impl/masking.py:9)."""
    return f"{column}_mask"


@dataclass(frozen=True)
class ColumnMeta:
    """Shape/padding declaration for one column.

    :param shape: () scalar, (L,) 1-D ragged padded to L, (L, M) 2-D.
    :param padding: fill value for padded positions.
    :param dtype: numpy dtype of the produced array.
    """

    shape: Tuple[int, ...] = ()
    padding: Union[int, float] = 0
    dtype: str = "int64"


class Metadata:
    """Mapping column → ColumnMeta (reference: metadata/metadata.py)."""

    def __init__(self, columns: Dict[str, ColumnMeta]):
        self._columns = dict(columns)

    def __getitem__(self, name: str) -> ColumnMeta:
        return self._columns[name]

    def __contains__(self, name: str) -> bool:
        return name in self._columns

    def __iter__(self):
        return iter(self._columns)

    def items(self):
        return self._columns.items()

    @property
    def names(self) -> Sequence[str]:
        return list(self._columns)

    @classmethod
    def from_dict(cls, spec: Dict[str, Dict]) -> "Metadata":
        """Build from ``{col: {"shape": ..., "padding": ..., "dtype": ...}}``."""
        columns = {}
        for name, raw in spec.items():
            shape = raw.get("shape", ())
            if isinstance(shape, int):
                shape = (shape,)
            columns[name] = ColumnMeta(
                shape=tuple(shape),
                padding=raw.get("padding", 0),
                dtype=raw.get("dtype", "int64"),
            )
        return cls(columns)


def pad_column(
    values: Sequence,
    meta: ColumnMeta,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Materialize one column of a batch into (array, mask-or-None).

    Scalars pass through; list values are LEFT-padded to the declared
    length (sequence convention: most recent events right-aligned), longer
    lists keep their tail.  2-D columns pad both trailing dims.
    """
    n = len(values)
    if meta.shape == ():
        return np.asarray(values, dtype=meta.dtype), None

    length = meta.shape[0]
    if len(meta.shape) == 1:
        arr = np.full((n, length), meta.padding, dtype=meta.dtype)
        mask = np.zeros((n, length), dtype=np.int8)
        for row, item in enumerate(values):
            item = np.asarray(item)
            take = min(len(item), length)
            if take:
                arr[row, length - take :] = item[len(item) - take :]
                mask[row, length - take :] = 1
        return arr, mask

    length, inner = meta.shape[0], meta.shape[1]
    arr = np.full((n, length, inner), meta.padding, dtype=meta.dtype)
    mask = np.zeros((n, length), dtype=np.int8)
    for row, item in enumerate(values):
        seq = list(item)
        take = min(len(seq), length)
        for j in range(take):
            sub = np.asarray(seq[len(seq) - take + j])
            m = min(len(sub), inner)
            arr[row, length - take + j, :m] = sub[:m]
        if take:
            mask[row, length - take :] = 1
    return arr, mask


# reference name (replay/data/nn/parquet/metadata.py ColumnMetadata)
ColumnMetadata = ColumnMeta


# Functional helpers under the reference's names
# (reference: replay/data/nn/parquet/metadata/metadata.py:85-112).
def get_1d_array_columns(metadata: Metadata) -> Sequence[str]:
    return sorted(n for n, m in metadata.items() if len(m.shape) == 1)


def get_2d_array_columns(metadata: Metadata) -> Sequence[str]:
    return sorted(n for n, m in metadata.items() if len(m.shape) == 2)


def get_numeric_columns(metadata: Metadata) -> Sequence[str]:
    return sorted(n for n, m in metadata.items() if len(m.shape) == 0)


def get_padding(metadata: Metadata, column_name: str):
    if column_name not in metadata:
        msg = f"Column {column_name} not found in metadata."
        raise KeyError(msg)
    return metadata[column_name].padding


def get_shape(metadata: Metadata, column_name: str) -> Sequence[int]:
    if column_name not in metadata:
        msg = f"Column {column_name} not found in metadata."
        raise KeyError(msg)
    shape = metadata[column_name].shape
    if not shape:
        msg = f"Column {column_name} is not an array."
        raise ValueError(msg)
    if any(s < 1 for s in shape):
        msg = f"Shape for column {column_name} must be positive."
        raise ValueError(msg)
    return list(shape)
