"""Property-based tests (hypothesis) over the data plane.

The reference keeps hypothesis as a dev dependency and uses it sparingly in
data tests (SURVEY §4); these pin the invariants that hold for ARBITRARY
inputs, where the example-based suites pin exact values.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.property

_settings = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def interaction_logs(draw, max_rows=60):
    n = draw(st.integers(min_value=1, max_value=max_rows))
    users = draw(
        st.lists(st.integers(0, 9), min_size=n, max_size=n)
    )
    items = draw(st.lists(st.integers(0, 14), min_size=n, max_size=n))
    ts = draw(
        st.lists(st.integers(0, 1000), min_size=n, max_size=n, unique=True)
    )
    return pd.DataFrame(
        {
            "query_id": users,
            "item_id": items,
            "rating": np.ones(n),
            "timestamp": ts,
        }
    )


@_settings
@given(
    # one homogeneous dtype per column: the reference's fit also sorts the
    # distinct values (label_encoder.py:188) and mixed int/str columns are
    # unsortable in both frameworks
    values=st.one_of(
        st.lists(st.integers(-1000, 1000), min_size=1, max_size=50),
        st.lists(st.text(max_size=6), min_size=1, max_size=50),
    )
)
def test_label_encoder_roundtrip(values):
    """transform → inverse_transform is the identity for any column."""
    from replay_tpu.preprocessing import LabelEncoder, LabelEncodingRule

    df = pd.DataFrame({"col": pd.Series(values, dtype=object)})
    enc = LabelEncoder([LabelEncodingRule("col")]).fit(df)
    out = enc.transform(df)
    # contiguous codes starting at 0
    codes = out["col"].to_numpy()
    assert codes.min() >= 0 and codes.max() < df["col"].nunique()
    back = enc.inverse_transform(out)
    assert back["col"].tolist() == df["col"].tolist()


@_settings
@given(
    base=st.lists(st.integers(0, 30), min_size=1, max_size=30),
    extra=st.lists(st.integers(0, 60), min_size=1, max_size=30),
)
def test_label_encoder_partial_fit_preserves_mapping(base, extra):
    from replay_tpu.preprocessing import LabelEncoder, LabelEncodingRule

    df1 = pd.DataFrame({"col": base})
    df2 = pd.DataFrame({"col": extra})
    enc = LabelEncoder([LabelEncodingRule("col")]).fit(df1)
    before = enc.transform(df1)["col"].tolist()
    enc.partial_fit(df2)
    after = enc.transform(df1)["col"].tolist()
    assert before == after  # old ids never change
    # the union is injectively encoded
    both = enc.transform(pd.DataFrame({"col": sorted(set(base) | set(extra))}))
    assert both["col"].nunique() == len(set(base) | set(extra))


@_settings
@given(log=interaction_logs(), test_size=st.floats(0.05, 0.9))
def test_ratio_splitter_partitions_rows(log, test_size):
    from replay_tpu.splitters import RatioSplitter

    train, test = RatioSplitter(
        test_size, divide_column="query_id", query_column="query_id"
    ).split(log)
    assert len(train) + len(test) <= len(log)  # cold-filtering may drop rows
    # row multisets are disjoint subsets of the input
    key = ["query_id", "item_id", "timestamp"]
    merged = pd.concat([train[key], test[key]])
    assert len(merged.merge(log[key], on=key)) == len(merged)
    assert len(train[key].merge(test[key], on=key)) == 0


@_settings
@given(log=interaction_logs())
def test_time_splitter_respects_time_order(log):
    from replay_tpu.splitters import TimeSplitter

    train, test = TimeSplitter(0.3, query_column="query_id").split(log)
    if len(train) and len(test):
        assert train["timestamp"].max() <= test["timestamp"].min()


@_settings
@given(log=interaction_logs(), n=st.integers(1, 5))
def test_min_count_filter_property(log, n):
    from replay_tpu.preprocessing.filters import MinCountFilter

    out = MinCountFilter(n, groupby_column="query_id").transform(log)
    if len(out):
        assert out.groupby("query_id").size().min() >= n
    # idempotent
    again = MinCountFilter(n, groupby_column="query_id").transform(out)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), again.reset_index(drop=True)
    )


@_settings
@given(log=interaction_logs())
def test_consecutive_duplicates_filter_property(log):
    from replay_tpu.preprocessing.filters import ConsecutiveDuplicatesFilter

    out = ConsecutiveDuplicatesFilter(
        query_column="query_id", item_column="item_id", timestamp_column="timestamp"
    ).transform(log)
    # no user has the same item twice in a row afterwards
    out = out.sort_values(["query_id", "timestamp"])
    for _, grp in out.groupby("query_id"):
        items = grp["item_id"].tolist()
        assert all(a != b for a, b in zip(items, items[1:]))


@_settings
@given(
    recs_items=st.lists(
        st.lists(st.integers(0, 20), min_size=1, max_size=10, unique=True),
        min_size=1,
        max_size=8,
    ),
    gt_items=st.lists(
        st.lists(st.integers(0, 20), min_size=1, max_size=10, unique=True),
        min_size=1,
        max_size=8,
    ),
)
def test_ranking_metrics_bounded(recs_items, gt_items):
    from replay_tpu.metrics import MAP, MRR, NDCG, HitRate, Precision, Recall

    n = min(len(recs_items), len(gt_items))
    rec_rows, gt_rows = [], []
    for u in range(n):
        for rank, i in enumerate(recs_items[u]):
            rec_rows.append((u, i, float(len(recs_items[u]) - rank)))
        for i in gt_items[u]:
            gt_rows.append((u, i))
    recs = pd.DataFrame(rec_rows, columns=["query_id", "item_id", "rating"])
    gt = pd.DataFrame(gt_rows, columns=["query_id", "item_id"])
    for metric_cls in (NDCG, Recall, Precision, MAP, MRR, HitRate):
        value = list(metric_cls(5)(recs, gt).values())[0]
        assert 0.0 <= value <= 1.0 + 1e-9, metric_cls.__name__


@_settings
@given(
    seqs=st.lists(
        st.lists(st.integers(0, 99), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    size=st.integers(1, 8),
    side=st.sampled_from(["left", "right"]),
    cut=st.sampled_from(["left", "right"]),
)
def test_padder_shape_property(seqs, size, side, cut):
    from replay_tpu.experimental.preprocessing import Padder

    df = pd.DataFrame({"seq": seqs})
    out = Padder(
        "seq", padding_side=side, padding_value=-1, array_size=size,
        cut_array=True, cut_side=cut,
    ).transform(df)
    assert all(len(v) == size for v in out["seq"])
    # real elements survive in order
    for orig, padded in zip(seqs, out["seq"]):
        kept = [v for v in padded if v != -1 or v in orig]
        expect = orig[-size:] if cut == "right" else orig[:size]
        real = [v for v in padded if v in orig]
        assert real == [v for v in expect]


@_settings
@given(
    n=st.integers(1, 200),
    batch=st.integers(1, 50),
)
def test_uniform_batching_tiles(n, batch):
    from replay_tpu.data.utils import UniformBatching

    ub = UniformBatching(n, batch)
    seen = []
    for b in range(len(ub)):
        first, last = ub[b]
        seen.extend(range(first, last))
    assert seen == list(range(n))


@given(
    ids=st.lists(st.integers(0, 63), min_size=16, max_size=16),
    capacity=st.integers(min_value=1, max_value=16),
)
@_settings
def test_a2a_lookup_exact_for_any_ids_and_capacity(ids, capacity):
    """The a2a ID-exchange embedding lookup must equal a dense take for
    ANY id distribution and ANY per-peer capacity — skewed batches trip
    the overflow certificate and must still be exact."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from replay_tpu.parallel import a2a_sharded_lookup, make_mesh

    mesh = make_mesh(data=1, model=8)
    table = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4)
    sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids_dev = jax.device_put(
        jnp.asarray(ids, jnp.int32), NamedSharding(mesh, P("model"))
    )
    got = a2a_sharded_lookup(sharded, ids_dev, mesh, capacity=capacity)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(table)[np.asarray(ids)]
    )


def _model_zoo():
    from replay_tpu.models import (
        ALSWrap,
        ItemKNN,
        PopRec,
        RandomRec,
        Wilson,
    )

    return [
        lambda: PopRec(),
        lambda: Wilson(),
        lambda: RandomRec(seed=5),
        lambda: ItemKNN(num_neighbours=5),
        lambda: ALSWrap(rank=4, num_iterations=2, seed=5),
    ]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(log=interaction_logs(), model_idx=st.integers(0, 4), k=st.integers(1, 5))
def test_classical_predict_invariants(log, model_idx, k):
    """For ARBITRARY logs and every classical family: ≤k rows per query,
    no seen items under the default filter, and determinism across a refit
    (the contract every downstream metric relies on)."""
    from replay_tpu.data import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )

    log = log.drop_duplicates(["query_id", "item_id"])
    schema = FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                        feature_source=FeatureSource.INTERACTIONS),
        ]
    )
    ds = Dataset(schema, log[["query_id", "item_id", "rating"]], check_consistency=False)
    make = _model_zoo()[model_idx]

    m = make()
    m.fit(ds)
    recs = m.predict(ds, k=k)
    assert set(recs.columns) >= {"query_id", "item_id", "rating"}
    per_q = recs.groupby("query_id").size()
    assert (per_q <= k).all(), f"{type(m).__name__} returned >k rows"
    seen = set(map(tuple, log[["query_id", "item_id"]].values))
    rec_pairs = set(map(tuple, recs[["query_id", "item_id"]].values))
    assert not (rec_pairs & seen), f"{type(m).__name__} recommended seen items"

    m2 = make()
    m2.fit(ds)
    recs2 = m2.predict(ds, k=k)
    key = ["query_id", "item_id"]
    pd.testing.assert_frame_equal(
        recs.sort_values(key).reset_index(drop=True)[key],
        recs2.sort_values(key).reset_index(drop=True)[key],
        obj=f"{type(m).__name__} refit determinism",
    )
