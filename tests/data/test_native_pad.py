"""Native ragged-row padder (data/nn/parquet/native/pad.cpp) must be a
bit-exact drop-in for the numpy left-pad-keep-tail semantics
(reference: replay/data/nn/parquet/impl/array_1d_column.py)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pytest


def _numpy_reference(flat, lengths, starts, length, padding, dtype):
    ends = starts + lengths
    col = np.arange(length)
    src = ends[:, None] - (length - col)[None, :]
    valid = src >= starts[:, None]
    np.clip(src, 0, max(len(flat) - 1, 0), out=src)
    flat = flat.astype(dtype, copy=False)
    arr = flat[src]
    arr[~valid] = padding
    return arr, valid.astype(np.int8)


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_native_matches_numpy(dtype):
    from replay_tpu.data.nn.parquet.native.pad import native_pad_list

    rng = np.random.default_rng(3)
    lens = np.array([0, 1, 5, 8, 12, 0, 7, 8], np.int64)  # empty + truncated
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    flat = rng.integers(0, 1000, int(lens.sum())).astype(np.int64)
    out = native_pad_list(flat, lens, starts, 8, -1, dtype)
    if out is None:
        pytest.skip("native padder unavailable (no toolchain)")
    arr, mask = out
    ref_arr, ref_mask = _numpy_reference(flat, lens, starts, 8, -1, np.dtype(dtype))
    np.testing.assert_array_equal(arr, ref_arr)
    np.testing.assert_array_equal(mask, ref_mask)
    assert arr.dtype == np.dtype(dtype)


def test_unsupported_dtype_returns_none():
    from replay_tpu.data.nn.parquet.native.pad import native_pad_list

    out = native_pad_list(
        np.zeros(4, np.int64), np.array([2, 2], np.int64),
        np.array([0, 2], np.int64), 4, 0, np.int16,
    )
    assert out is None  # caller falls back to numpy


def test_pad_list_batch_uses_native_and_matches(tmp_path):
    """End to end through ParquetDataset: row content identical whether or
    not the native library resolves (the public contract)."""
    import pandas as pd

    from replay_tpu.data.nn.parquet.metadata import ColumnMeta, Metadata
    from replay_tpu.data.nn.parquet.parquet_dataset import ParquetDataset

    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 50, int(rng.integers(1, 12))).tolist() for _ in range(64)]
    frame = pd.DataFrame({"query_id": np.arange(64), "item_id": rows})
    path = str(tmp_path / "log.parquet")
    frame.to_parquet(path)
    meta = Metadata(
        {
            "query_id": ColumnMeta(),
            "item_id": ColumnMeta(shape=(6,), padding=50, dtype="int32"),
        }
    )
    ds = ParquetDataset(path, meta, batch_size=64, replica_id=0, num_replicas=1)
    batch = next(iter(ds))
    for r, row in enumerate(rows):
        keep = np.asarray(row[-6:], np.int32)
        expect = np.concatenate([np.full(6 - len(keep), 50, np.int32), keep])
        np.testing.assert_array_equal(batch["item_id"][r], expect)
        np.testing.assert_array_equal(
            batch["item_id_mask"][r],
            np.concatenate([np.zeros(6 - len(keep), np.int8), np.ones(len(keep), np.int8)]),
        )
