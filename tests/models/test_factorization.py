"""ALS / SLIM / Word2Vec tests on a block-structured log."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.models import ALSWrap, SLIM, Word2VecRec

N_GROUPS, GROUP_SIZE = 4, 25
N_ITEMS = N_GROUPS * GROUP_SIZE


@pytest.fixture(scope="module")
def block_dataset():
    """Users interact ~90% inside their item block — strong low-rank structure."""
    rng = np.random.default_rng(0)
    rows = []
    for u in range(120):
        group = u % N_GROUPS
        for t in range(30):
            if rng.random() < 0.9:
                item = int(group * GROUP_SIZE + rng.integers(0, GROUP_SIZE))
            else:
                item = int(rng.integers(0, N_ITEMS))
            rows.append((u, item, 1.0, t))
    df = pd.DataFrame(
        rows, columns=["user_id", "item_id", "rating", "timestamp"]
    ).drop_duplicates(["user_id", "item_id"])
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating",
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "timestamp",
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    return Dataset(schema, df)


def in_group_fraction(recs):
    hits = tot = 0
    for u, grp in recs.groupby("user_id"):
        g = u % N_GROUPS
        lo, hi = g * GROUP_SIZE, (g + 1) * GROUP_SIZE
        hits += ((grp["item_id"] >= lo) & (grp["item_id"] < hi)).sum()
        tot += len(grp)
    return hits / tot


@pytest.mark.parametrize(
    "model,threshold",
    [
        (ALSWrap(rank=16, seed=0, num_iterations=5), 0.8),
        (ALSWrap(rank=16, seed=0, num_iterations=5, implicit_prefs=False), 0.5),
        (SLIM(beta=0.01, lambda_=0.01), 0.9),
        (Word2VecRec(rank=16, window_size=3, max_iter=10, seed=0, batch_size=2048), 0.8),
    ],
    ids=["als-implicit", "als-explicit", "slim", "word2vec"],
)
def test_recovers_block_structure(block_dataset, model, threshold):
    model.fit(block_dataset)
    recs = model.predict(block_dataset, k=5)
    assert recs.groupby("user_id").size().max() <= 5
    frac = in_group_fraction(recs)
    assert frac > threshold, f"in-group fraction {frac}"
    # filter-seen honored
    seen = set(
        map(tuple, block_dataset.interactions[["user_id", "item_id"]].to_numpy())
    )
    rec_pairs = set(map(tuple, recs[["user_id", "item_id"]].to_numpy()))
    assert not (seen & rec_pairs)


def test_als_predict_pairs(block_dataset):
    model = ALSWrap(rank=8, seed=0, num_iterations=3)
    model.fit(block_dataset)
    pairs = pd.DataFrame({"user_id": [0, 0, 1], "item_id": [1, 50, 2]})
    scored = model.predict_pairs(pairs, block_dataset)
    assert len(scored) == 3
    assert scored["rating"].notna().all()


def test_als_nearest_items(block_dataset):
    model = ALSWrap(rank=16, seed=0, num_iterations=5)
    model.fit(block_dataset)
    nn = model.get_nearest_items([0], k=5)
    # items nearest to item 0 should come from its block
    assert (nn["neighbour_item_id"] < GROUP_SIZE).mean() >= 0.8
    # self never returned
    assert (nn["neighbour_item_id"] != 0).all()


def test_word2vec_requires_dataset_at_predict(block_dataset):
    model = Word2VecRec(rank=8, max_iter=1, seed=0)
    model.fit(block_dataset)
    with pytest.raises(ValueError):
        model._score_block(np.array([0]), np.array([0]), dataset=None)


def test_slim_similarity_nonnegative_zero_diag(block_dataset):
    model = SLIM(beta=0.05, lambda_=0.05)
    model.fit(block_dataset)
    sim = np.asarray(model._sim_dense)
    assert sim.min() >= 0.0
    assert np.allclose(np.diag(sim), 0.0)
