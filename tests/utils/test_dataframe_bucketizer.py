"""reference: tests/utils/test_dataframe_bucketizer.py — same two cases
(with table_name at construction; set later + error message), plus the
bucketing invariants Spark's bucketBy guarantees."""

import numpy as np
import pandas as pd
import pytest

from replay_tpu.utils import DataframeBucketizer


@pytest.fixture
def log():
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "user_idx": rng.integers(0, 50, 300),
            "item_idx": rng.integers(0, 20, 300),
            "relevance": rng.random(300),
        }
    )


def test_dataframe_bucketizer(tmp_path, log):
    # case 1: initialization with table_name
    with DataframeBucketizer(
        bucketing_key="user_idx",
        partition_num=4,
        spark_warehouse_dir=str(tmp_path),
        table_name="bucketed_log",
    ) as bucketizer:
        bucketed_log = bucketizer.transform(log)
        assert (tmp_path / "bucketed_log").exists()
        assert len(bucketed_log) == len(log)
        files = bucketizer.bucket_files()
        assert 1 <= len(files) <= 4
        # invariants: each key in exactly one bucket file, file key-sorted
        seen = {}
        for f in files:
            part = pd.read_parquet(f)
            assert (np.diff(part["user_idx"].to_numpy()) >= 0).all()
            for u in part["user_idx"].unique():
                assert u not in seen, "key split across buckets"
                seen[u] = f
        assert set(seen) == set(log["user_idx"].unique())
    # context exit removes the parquet dir (reference __exit__ semantics)
    assert not (tmp_path / "bucketed_log").exists()

    # case 2: no table_name at construction
    with DataframeBucketizer(
        bucketing_key="user_idx",
        partition_num=2,
        spark_warehouse_dir=str(tmp_path),
    ) as bucketizer:
        with pytest.raises(
            ValueError,
            match=r"Parameter 'table_name' is not set! Please set it via method 'set_table_name'.",
        ):
            bucketizer.transform(log)
        bucketizer.set_table_name("bucketed_log2")
        bucketed_log = bucketizer.transform(log)
        assert (tmp_path / "bucketed_log2").exists()
        assert len(bucketed_log) == len(log)


def test_bucketizer_string_keys_and_overwrite(tmp_path, log):
    log = log.assign(user_idx=log["user_idx"].map("u{}".format))
    b = DataframeBucketizer("user_idx", 3, str(tmp_path), table_name="t")
    first = b.transform(log)
    again = b.transform(log)  # overwrite mode: no duplicate accumulation
    assert len(first) == len(again) == len(log)
    # row multiset preserved
    key = lambda df: sorted(map(tuple, df[["user_idx", "item_idx"]].to_numpy()))
    assert key(first) == key(log)
    b.remove_parquet()
    assert not (tmp_path / "t").exists()
