"""The synthetic ML-1M generator must hit the published marginals
(QUALITY.md protocol surrogate; reference data files
examples/data/ml1m_{users,items}.dat)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np

from replay_tpu.data.synthetic import RATING_SHARES, synthetic_ml1m


def test_marginals_at_reduced_scale():
    inter, users, items = synthetic_ml1m(seed=3, scale=0.1)
    n_users = inter["query_id"].nunique()
    assert n_users == len(users) == 604

    per_user = inter.groupby("query_id").size()
    assert per_user.min() >= 20  # the ML-1M inclusion rule
    assert 120 <= per_user.mean() <= 210
    assert 60 <= per_user.median() <= 140
    assert per_user.max() <= 2314

    shares = inter["rating"].value_counts(normalize=True).sort_index()
    for value, share in RATING_SHARES.items():
        assert abs(shares[float(value)] - share) < 0.01

    # power-law item popularity: top item far above the median
    per_item = inter.groupby("item_id").size()
    assert per_item.max() > 10 * per_item.median()
    assert per_item.max() <= 3428

    # timestamps inside the published span, sorted per user
    assert inter["timestamp"].min() >= 956_000_000
    assert inter["timestamp"].max() <= 1_046_454_590
    grouped = inter.groupby("query_id")["timestamp"]
    assert bool(grouped.apply(lambda s: s.is_monotonic_increasing).all())


def test_structure_is_learnable():
    """Genre/demographic affinity must beat chance: users' held-out items
    should be closer to their history centroid than random items are."""
    inter, _, items = synthetic_ml1m(seed=5, scale=0.05)
    genre_sets = {
        row.item_id: set(str(row.genres).split("|")) for row in items.itertuples()
    }
    rng = np.random.default_rng(0)
    hits, rand_hits, n = 0, 0, 0
    for _, grp in inter.groupby("query_id"):
        ids = grp["item_id"].to_numpy()
        if len(ids) < 30:
            continue
        hist, held = ids[:-10], ids[-10:]
        hist_genres = set().union(*(genre_sets[i] for i in hist[:50]))
        hits += sum(bool(genre_sets[i] & hist_genres) for i in held)
        rand = rng.choice(items["item_id"].to_numpy(), 10, replace=False)
        rand_hits += sum(bool(genre_sets[i] & hist_genres) for i in rand)
        n += 10
    assert hits / n >= rand_hits / n  # affinity at least matches chance
    # and repeats deterministically
    again, _, _ = synthetic_ml1m(seed=5, scale=0.05)
    assert inter.equals(again)
