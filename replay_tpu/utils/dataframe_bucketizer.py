"""Hash-bucketed parquet warehouse for dataframes.

reference: replay/utils/dataframe_bucketizer.py — there, a pyspark
``Transformer`` that repartitions by a key, ``bucketBy``-writes the result
into the Spark warehouse dir, and returns the bucketed table so later joins
on the key avoid shuffles.

The TPU-native analog serves the same purpose for our parquet streaming
layer: rows are hash-partitioned on ``bucketing_key`` into ``partition_num``
parquet files, each file sorted by the key, under
``{warehouse_dir}/{table_name}/bucket-*.parquet``. A bucketed table gives
per-host shards (one or more whole buckets per process) where every row for
a given key lives in exactly one file, already key-sorted — the property
Spark's bucketing provides for shuffle-free joins, and the property our
:class:`~replay_tpu.data.nn.parquet.ParquetDataset` wants for deterministic
per-host sharding without a global shuffle.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import List, Union

import numpy as np
import pandas as pd

from replay_tpu.utils.types import DataFrameLike, PandasDataFrame


def _bucket_of(values: np.ndarray, partition_num: int) -> np.ndarray:
    """Deterministic hash-bucket assignment (stable across runs/processes).

    Integer keys use a Fibonacci multiplicative hash; other dtypes fall back
    to CRC32 of the string form (Python's builtin ``hash()`` is salted per
    process and would not be stable across runs).
    """
    if np.issubdtype(values.dtype, np.integer):
        h = values.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return (h >> np.uint64(33)).astype(np.int64) % partition_num
    import zlib

    return np.fromiter(
        (zlib.crc32(str(v).encode()) for v in values), dtype=np.int64, count=len(values)
    ) % partition_num


class DataframeBucketizer:
    """Bucket a dataframe by key into sorted parquet files in a warehouse dir.

    Mirrors the reference's constructor/usage surface (context manager,
    ``set_table_name``, ``transform``, ``remove_parquet``) with parquet files
    on local/shared disk in place of the Spark warehouse.

    >>> import pandas as pd, tempfile
    >>> log = pd.DataFrame({"user_idx": [3, 1, 2, 1], "item_idx": [0, 1, 2, 3]})
    >>> with tempfile.TemporaryDirectory() as d:
    ...     with DataframeBucketizer("user_idx", 2, d, table_name="log") as b:
    ...         out = b.transform(log)
    ...     len(out) == len(log)
    True
    """

    def __init__(
        self,
        bucketing_key: str,
        partition_num: int,
        spark_warehouse_dir: str,
        table_name: str = "",
    ):
        self.bucketing_key = bucketing_key
        self.partition_num = int(partition_num)
        self.spark_warehouse_dir = str(spark_warehouse_dir)
        self.table_name = table_name

    # -- reference Transformer surface -------------------------------------
    def __enter__(self) -> "DataframeBucketizer":
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        self.remove_parquet()

    def set_table_name(self, table_name: str) -> None:
        """Sets table name"""
        self.table_name = table_name

    @property
    def _table_dir(self) -> Path:
        return Path(self.spark_warehouse_dir) / self.table_name

    def remove_parquet(self) -> None:
        """Removes parquets where bucketed dataset is stored"""
        if self.table_name and self._table_dir.exists():
            shutil.rmtree(self._table_dir)

    def bucket_files(self) -> List[Path]:
        """Paths of the bucket files (one per non-empty partition), sorted."""
        return sorted(self._table_dir.glob("bucket-*.parquet"))

    def transform(self, dataset: DataFrameLike) -> PandasDataFrame:
        """Write ``dataset`` bucketed+sorted by the key; return it re-read.

        The returned frame is the bucket files read back from disk and
        concatenated in bucket order (so it is key-clustered, like Spark's
        bucketed table scan, and carries any parquet dtype round-trip effects
        — the analog of the reference returning ``spark.table(table_name)``),
        with the same row multiset as the input.
        """
        if not self.table_name:
            msg = "Parameter 'table_name' is not set! Please set it via method 'set_table_name'."
            raise ValueError(msg)
        df = self._to_pandas(dataset)
        if self.bucketing_key not in df.columns:
            msg = f"bucketing_key '{self.bucketing_key}' not in dataframe columns"
            raise KeyError(msg)

        table_dir = self._table_dir
        if table_dir.exists():  # overwrite semantics, like .mode("overwrite")
            shutil.rmtree(table_dir)
        table_dir.mkdir(parents=True)

        buckets = _bucket_of(df[self.bucketing_key].to_numpy(), self.partition_num)
        for b in range(self.partition_num):
            part = df[buckets == b]
            if len(part) == 0:
                continue
            part = part.sort_values(self.bucketing_key, kind="stable")
            part.to_parquet(table_dir / f"bucket-{b:05d}.parquet", index=False)
        files = self.bucket_files()
        if not files:
            return df.iloc[:0].copy()
        return pd.concat((pd.read_parquet(f) for f in files), ignore_index=True)

    _transform = transform  # reference private alias

    @staticmethod
    def _to_pandas(dataset: DataFrameLike) -> PandasDataFrame:
        if isinstance(dataset, pd.DataFrame):
            return dataset
        to_pandas = getattr(dataset, "to_pandas", None)
        if callable(to_pandas):
            return to_pandas()
        return pd.DataFrame(dataset)


__all__: List[str] = ["DataframeBucketizer"]
