"""Small data-layer utilities.

TPU-native analogs of reference helpers: UniformBatching
(reference: replay/data/utils/batching.py:39), pyarrow↔jax dtype tables
(reference: replay/data/utils/typing/dtype.py maps pyarrow↔torch), and the
canonical interactions schema (reference: replay/data/spark_schema.py:6
get_schema builds a Spark StructType; here a pandas dtype mapping).
"""

from functools import lru_cache
from typing import Dict, Iterator, Tuple


@lru_cache(maxsize=256)
def uniform_batch_count(length: int, batch_size: int) -> int:
    if length <= 0 or batch_size <= 0:
        msg = f"invalid length={length} batch_size={batch_size}"
        raise ValueError(msg)
    return -(-length // batch_size)


class UniformBatching:
    """index → (first, last) batch-limit math (reference: batching.py:39)."""

    def __init__(self, length: int, batch_size: int) -> None:
        self.batch_count = uniform_batch_count(length, batch_size)
        self.length = length
        self.batch_size = batch_size

    def __len__(self) -> int:
        return self.batch_count

    def get_limits(self, index: int) -> Tuple[int, int]:
        if index < 0 or index >= self.batch_count:
            msg = f"Batching index is invalid. Got {index}."
            raise IndexError(msg)
        first = index * self.batch_size
        return first, min(self.length, first + self.batch_size)

    def __getitem__(self, index: int) -> Tuple[int, int]:
        return self.get_limits(index)

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        for index in range(self.batch_count):
            yield self.get_limits(index)


# pyarrow type name ↔ numpy/jax dtype string (reference dtype.py tables)
PYARROW_TO_JAX: Dict[str, str] = {
    "int8": "int8",
    "int16": "int16",
    "int32": "int32",
    "int64": "int64",
    "uint8": "uint8",
    "uint16": "uint16",
    "uint32": "uint32",
    "uint64": "uint64",
    "halffloat": "float16",
    "float": "float32",
    "double": "float64",
    "bool": "bool",
}
JAX_TO_PYARROW: Dict[str, str] = {v: k for k, v in PYARROW_TO_JAX.items()}


def get_schema(
    query_column: str = "query_id",
    item_column: str = "item_id",
    timestamp_column: str = "timestamp",
    rating_column: str = "rating",
    has_timestamp: bool = True,
    has_rating: bool = True,
) -> Dict[str, str]:
    """Canonical interactions dtype mapping (reference: spark_schema.py:6);
    timestamp/rating columns are optional like the reference StructType."""
    schema = {query_column: "int64", item_column: "int64"}
    if has_timestamp:
        schema[timestamp_column] = "int64"
    if has_rating:
        schema[rating_column] = "float64"
    return schema
