"""Differential parity: replay_tpu's streaming ParquetDataset vs the
reference's torch ParquetDataset reading THE SAME parquet file.

Sequential (unshuffled, single-replica) reads must serve identical row
content: scalar columns, 1-D ragged columns padded to the declared shape
with `{col}_mask` validity, and 2-D nested columns.  Batch boundaries may
differ (we pad the final batch to a static shape with `batch_mask`; the
reference yields a short tail), so rows are compared after concatenation.
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")

SEQ = 8
ROWS = 517  # deliberately not a multiple of any batch/partition size


@pytest.fixture(scope="module")
def parquet_file(tmp_path_factory):
    rng = np.random.default_rng(17)
    items = [
        rng.integers(0, 99, rng.integers(1, SEQ + 1)).tolist() for _ in range(ROWS)
    ]
    frame = pd.DataFrame(
        {
            "user_id": np.arange(ROWS, dtype=np.int64),
            "item_id": items,
            "ratings": [[float(i % 5), 1.0] for i in range(ROWS)],
        }
    )
    path = tmp_path_factory.mktemp("pq") / "log.parquet"
    frame.to_parquet(path)
    return str(path)


def _gather_ours(path):
    from replay_tpu.data.nn.parquet import ColumnMeta, Metadata, ParquetDataset

    meta = Metadata(
        {
            "user_id": ColumnMeta(shape=(), padding=0, dtype=np.int64),
            "item_id": ColumnMeta(shape=(SEQ,), padding=-1, dtype=np.int64),
            "ratings": ColumnMeta(shape=(2,), padding=0.0, dtype=np.float64),
        }
    )
    ds = ParquetDataset(
        path, meta, batch_size=64, partition_size=128, shuffle=False,
        replica_id=0, num_replicas=1,
    )
    cols = {"user_id": [], "item_id": [], "item_id_mask": [], "ratings": []}
    for batch in ds:
        keep = np.asarray(batch["batch_mask"]).astype(bool)
        for name in cols:
            cols[name].append(np.asarray(batch[name])[keep])
    return {k: np.concatenate(v) for k, v in cols.items()}


def _gather_reference(path):
    from replay.data.nn.parquet.parquet_dataset import ParquetDataset

    meta = {
        "user_id": {"padding": 0},
        "item_id": {"shape": SEQ, "padding": -1},
        "ratings": {"shape": 2, "padding": 0.0},
    }
    ds = ParquetDataset(path, meta, partition_size=128, batch_size=64)
    cols = {"user_id": [], "item_id": [], "item_id_mask": [], "ratings": []}
    for batch in ds:
        for name in cols:
            cols[name].append(batch[name].cpu().numpy())
    return {k: np.concatenate(v) for k, v in cols.items()}


def test_sequential_read_parity(reference, parquet_file):
    ours = _gather_ours(parquet_file)
    ref = _gather_reference(parquet_file)

    assert len(ours["user_id"]) == len(ref["user_id"]) == ROWS

    # align by user_id in case partition boundaries reorder differently
    o_order = np.argsort(ours["user_id"], kind="stable")
    r_order = np.argsort(ref["user_id"], kind="stable")
    np.testing.assert_array_equal(
        ours["user_id"][o_order], ref["user_id"][r_order]
    )
    np.testing.assert_array_equal(
        ours["item_id_mask"][o_order].astype(bool),
        ref["item_id_mask"][r_order].astype(bool),
    )
    # padded positions may hold different fill only if masks differ — they
    # don't, so the full padded arrays must be identical
    np.testing.assert_array_equal(ours["item_id"][o_order], ref["item_id"][r_order])
    np.testing.assert_allclose(ours["ratings"][o_order], ref["ratings"][r_order])
