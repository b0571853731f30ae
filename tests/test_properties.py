"""Property-based tests (hypothesis) + executable docstring examples —
the reference's test-strategy tail (SURVEY.md §4: hypothesis dev-dep,
--doctest-modules in default addopts)."""

import doctest

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


# ----------------------------------------------------------------- doctests
def test_docstring_examples_execute():
    import replay_tpu.preprocessing.filters as filters_mod

    results = doctest.testmod(filters_mod, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in filters"


# ------------------------------------------------------------- splitters
@settings(max_examples=25, deadline=None)
@given(
    n_rows=st.integers(5, 200),
    test_size=st.floats(0.1, 0.9),
    seed=st.integers(0, 10_000),
)
def test_ratio_splitter_partitions(n_rows, test_size, seed):
    from replay_tpu.splitters import RatioSplitter

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "query_id": rng.integers(0, max(n_rows // 5, 1), n_rows),
            "item_id": rng.integers(0, 50, n_rows),
            "timestamp": rng.permutation(n_rows),
        }
    )
    train, test = RatioSplitter(test_size=test_size).split(df)
    # exact partition: no row lost, none duplicated
    assert len(train) + len(test) == len(df)
    merged = pd.concat([train, test]).sort_index()
    pd.testing.assert_frame_equal(merged, df.sort_index())


@settings(max_examples=25, deadline=None)
@given(
    values=st.lists(
        st.text(min_size=1, max_size=5), min_size=1, max_size=60
    ),
)
def test_label_encoder_roundtrip(values):
    from replay_tpu.preprocessing import LabelEncoder, LabelEncodingRule

    df = pd.DataFrame({"col": values})
    encoder = LabelEncoder([LabelEncodingRule("col")])
    encoded = encoder.fit_transform(df)
    # contiguous ids starting at 0
    ids = encoded["col"].to_numpy()
    assert ids.min() >= 0
    assert ids.max() < df["col"].nunique()
    decoded = encoder.inverse_transform(encoded)
    assert list(decoded["col"]) == values


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 300),
    n_replicas=st.integers(1, 8),
    seed=st.integers(0, 100),
)
def test_replica_indices_tile_dataset(n, n_replicas, seed):
    from replay_tpu.data.nn.parquet import partitioning_per_replica, replica_indices

    seen = []
    per = partitioning_per_replica(n, n_replicas)
    for r in range(n_replicas):
        idx = replica_indices(n, r, n_replicas, shuffle=True, seed=seed)
        assert len(idx) == per
        seen.extend(idx.tolist())
    assert set(seen) == set(range(n))


@settings(max_examples=20, deadline=None)
@given(
    lengths=st.lists(st.integers(1, 30), min_size=1, max_size=20),
    max_len=st.integers(1, 40),
)
def test_pad_batch_mask_invariants(lengths, max_len):
    from replay_tpu.data.nn import (
        SequentialDataset,
        TensorFeatureInfo,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.nn.schema import TensorFeatureSource
    from replay_tpu.data.schema import FeatureHint, FeatureSource

    rows = []
    for u, length in enumerate(lengths):
        for t in range(length):
            rows.append((u, (u + t) % 50, t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=50,
            embedding_dim=4,
            padding_value=50,
        )
    )
    ds = SequentialDataset.from_interactions(schema, log)
    batch = ds.pad_batch(np.arange(len(lengths)), max_len)
    mask = batch["padding_mask"]
    # left padding: once valid, valid to the end of the row
    assert np.all(np.diff(mask.astype(int), axis=1) >= 0)
    np.testing.assert_array_equal(
        mask.sum(axis=1), np.minimum(np.asarray(lengths), max_len)
    )
    # padded positions hold the padding value
    assert np.all(batch["item_id"][mask == 0] == 50)


@settings(max_examples=20, deadline=None)
@given(
    lengths=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    max_len=st.integers(2, 16),
    step=st.integers(1, 8),
)
def test_sliding_window_index_invariants(lengths, max_len, step):
    """window_index must (a) yield exactly the reference count per query —
    ceil(max(left,0)/step) windows at positive offsets plus the offset-0
    window — (b) include crop 0 (the tail window) for every query, and
    (c) produce crops that reconstruct the reference's offsets-from-start
    left, left-step, …, 0."""
    from replay_tpu.data.nn import (
        SequentialDataset,
        TensorFeatureInfo,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.nn.schema import TensorFeatureSource
    from replay_tpu.data.schema import FeatureHint, FeatureSource

    rows = []
    for u, length in enumerate(lengths):
        for t in range(length):
            rows.append((u, (u + t) % 50, t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=50,
            embedding_dim=4,
            padding_value=50,
        )
    )
    ds = SequentialDataset.from_interactions(schema, log)
    rows_idx, crops = ds.window_index(max_len, step)

    for u, length in enumerate(lengths):
        left = length - max_len
        mine = sorted(crops[rows_idx == u].tolist())
        # reference iteration: offsets left, left-step, ... (>0), then 0
        offsets = []
        o = left
        while o > 0:
            offsets.append(o)
            o -= step
        offsets.append(0)
        # window at offset-from-start o covers [o, o+max_len) == cropping
        # left - o most-recent events (left > 0); short sequences have one
        # whole-sequence window at crop 0
        expected = sorted({left - off for off in offsets}) if left > 0 else [0]
        assert mine == expected, (u, length, mine, expected)
        assert 0 in mine  # tail window always present
