"""Differential parity: sliding-window training-sample generation vs the
reference's TorchSequentialDataset(sliding_window_step=…).

Both sides enumerate, per query, windows anchored at descending
offsets-from-start down to 0; sample counts, window contents and padding
must agree exactly.
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")

MAX_LEN = 4


def _interactions():
    rng = np.random.default_rng(5)
    rows = []
    for u, n in enumerate([2, 4, 5, 9, 13]):  # below, at, and above MAX_LEN
        for t in range(n):
            rows.append((u, int(rng.integers(0, 50)), t))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"])


def _reference_samples(reference, df, step):
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn import PandasSequentialDataset, TensorFeatureInfo, TensorFeatureSource, TensorSchema
    from replay.data.nn.torch_sequential_dataset import TorchSequentialDataset

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            FeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=50,
            padding_value=-1,
        )
    )
    grouped = (
        df.sort_values(["user_id", "timestamp"])
        .groupby("user_id")
        .agg({"item_id": list})
        .reset_index()
    )
    seq_ds = PandasSequentialDataset(
        tensor_schema=schema, query_id_column="user_id", item_id_column="item_id",
        sequences=grouped,
    )
    tds = TorchSequentialDataset(
        sequential=seq_ds, max_sequence_length=MAX_LEN, sliding_window_step=step,
    )
    out = []
    for i in range(len(tds)):
        query_id, padding_mask, features = tds[i]
        out.append(
            (int(query_id), features["item_id"].numpy(), padding_mask.numpy())
        )
    return out


def _our_samples(df, step):
    from replay_tpu.data.nn import (
        SequentialDataset, TensorFeatureInfo, TensorFeatureSource, TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=50,
            padding_value=-1,
        )
    )
    ds = SequentialDataset.from_interactions(
        schema, df, query_column="user_id", timestamp_column="timestamp"
    )
    out = []
    for batch in ds.batches(
        batch_size=3, max_sequence_length=MAX_LEN, sliding_window_step=step
    ):
        keep = batch["batch_mask"].astype(bool)
        for q, items, mask in zip(
            batch["query_id"][keep], batch["item_id"][keep], batch["padding_mask"][keep]
        ):
            out.append((int(q), np.where(mask > 0, items, -1), mask))
    return out


@pytest.mark.parametrize("step", [1, 2, 3])
def test_sliding_windows_match_reference(reference, step):
    df = _interactions()
    ref = _reference_samples(reference, df, step)
    ours = _our_samples(df, step)

    assert len(ref) == len(ours), (len(ref), len(ours))
    # same multiset of (query, window) samples — order may differ between
    # the reference's per-user enumeration and our batch layout
    ref_sorted = sorted(ref, key=lambda s: (s[0], s[1].tolist()))
    ours_sorted = sorted(ours, key=lambda s: (s[0], s[1].tolist()))
    for (rq, ritems, rmask), (oq, oitems, omask) in zip(ref_sorted, ours_sorted):
        assert rq == oq
        np.testing.assert_array_equal(ritems, oitems)
        np.testing.assert_array_equal(rmask.astype(bool), omask.astype(bool))


def test_default_is_single_tail_window(reference):
    df = _interactions()
    ref = _reference_samples(reference, df, None)
    ours = _our_samples(df, None)
    assert len(ref) == len(ours) == df["user_id"].nunique()
    for (rq, ritems, _), (oq, oitems, _) in zip(ref, ours):
        assert rq == oq
        np.testing.assert_array_equal(ritems, oitems)
