"""Native C++ HNSW index tests."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pytest

from replay_tpu.ann import HnswIndex, HnswParam

rng = np.random.default_rng(0)


@pytest.fixture(scope="module")
def vectors():
    return rng.normal(size=(3000, 24)).astype(np.float32)


def test_ip_recall(vectors):
    idx = HnswIndex(24, space="ip", m=16, ef_construction=200)
    idx.add_items(vectors)
    idx.set_ef(128)
    q = rng.normal(size=(50, 24)).astype(np.float32)
    labels, dists = idx.knn_query(q, 10)
    exact = np.argsort(-(q @ vectors.T), axis=1)[:, :10]
    recall = np.mean([len(set(labels[i]) & set(exact[i])) / 10 for i in range(50)])
    assert recall > 0.9
    # distances are negated similarities, sorted ascending
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_l2_space(vectors):
    idx = HnswIndex(24, space="l2")
    idx.add_items(vectors[:500])
    idx.set_ef(64)
    q = vectors[:3]
    labels, dists = idx.knn_query(q, 1)
    # nearest neighbour of an indexed vector is itself
    np.testing.assert_array_equal(labels[:, 0], [0, 1, 2])
    np.testing.assert_allclose(dists[:, 0], 0.0, atol=1e-5)


def test_custom_ids_and_len(vectors):
    idx = HnswIndex(24, space="ip")
    ids = np.arange(100, 200, dtype=np.int64)
    idx.add_items(vectors[:100], ids)
    assert len(idx) == 100
    labels, _ = idx.knn_query(vectors[:1], 5)
    assert labels.min() >= 100


def test_save_load_roundtrip(tmp_path, vectors):
    idx = HnswIndex(24, space="ip")
    idx.add_items(vectors[:800])
    idx.set_ef(64)
    q = rng.normal(size=(10, 24)).astype(np.float32)
    before, _ = idx.knn_query(q, 5)
    idx.save(str(tmp_path / "index.bin"))
    restored = HnswIndex.load(str(tmp_path / "index.bin"))
    restored.set_ef(64)
    after, _ = restored.knn_query(q, 5)
    np.testing.assert_array_equal(before, after)


def test_bad_space_rejected():
    with pytest.raises(ValueError):
        HnswIndex(8, space="hamming")


def test_ann_als_integration(tmp_path):
    import pandas as pd

    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )
    from replay_tpu.models import ALSWrap

    rows = []
    for u in range(60):
        g = u % 3
        for t in range(20):
            item = int(g * 20 + rng.integers(0, 20)) if rng.random() < 0.9 else int(rng.integers(0, 60))
            rows.append((u, item, 1.0, t))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"]).drop_duplicates(
        ["user_id", "item_id"]
    )
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    ds = Dataset(schema, df)
    exact = ALSWrap(rank=8, seed=0, num_iterations=4)
    exact.fit(ds)
    ann = ALSWrap(rank=8, seed=0, num_iterations=4, index_builder=HnswParam(ef_search=200))
    ann.fit(ds)
    recs_exact = exact.predict(ds, k=5)
    recs_ann = ann.predict(ds, k=5)
    overlap = []
    for u in range(60):
        a = set(recs_exact[recs_exact.user_id == u].item_id)
        b = set(recs_ann[recs_ann.user_id == u].item_id)
        overlap.append(len(a & b) / max(len(a), 1))
    assert np.mean(overlap) > 0.9
    seen = set(map(tuple, df[["user_id", "item_id"]].to_numpy()))
    assert not (seen & set(map(tuple, recs_ann[["user_id", "item_id"]].to_numpy())))


def test_ann_word2vec_integration():
    import pandas as pd

    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureType,
    )
    from replay_tpu.models import Word2VecRec

    rows = []
    for u in range(40):
        g = u % 2
        for t in range(15):
            item = int(g * 15 + rng.integers(0, 15))
            rows.append((u, item, t))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"]).drop_duplicates(
        ["user_id", "item_id"]
    )
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP),
        ]
    )
    ds = Dataset(schema, df)
    exact = Word2VecRec(rank=8, seed=0, max_iter=3, min_count=0)
    exact.fit(ds)
    ann = Word2VecRec(rank=8, seed=0, max_iter=3, min_count=0)
    ann.init_index_builder(HnswParam(ef_search=200))
    ann.fit(ds)
    assert ann.ann_enabled and ann._ann_index is not None
    recs_exact = exact.predict(ds, k=5)
    recs_ann = ann.predict(ds, k=5)
    overlap = []
    for u in range(40):
        a = set(recs_exact[recs_exact.user_id == u].item_id)
        b = set(recs_ann[recs_ann.user_id == u].item_id)
        overlap.append(len(a & b) / max(len(a), 1))
    assert np.mean(overlap) > 0.85
    # seen items excluded inside the native search
    seen = df.groupby("user_id").item_id.agg(set)
    for u, items in recs_ann.groupby("user_id").item_id.agg(set).items():
        assert not (items & seen[u])
