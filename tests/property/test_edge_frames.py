"""Edge-input sweep: every filter and splitter must handle empty and
single-row frames without crashing (the reference's own edge behavior —
Spark DataFrames are naturally empty-safe, so the single-plane rewrite has
to earn the same robustness explicitly)."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.property


def _cols():
    return {
        "query_id": pd.Series([], dtype=np.int64),
        "item_id": pd.Series([], dtype=np.int64),
        "rating": pd.Series([], dtype=np.float64),
        "timestamp": pd.Series([], dtype=np.int64),
    }


def empty_frame():
    return pd.DataFrame(_cols())


def one_row_frame():
    return pd.DataFrame(
        {"query_id": [1], "item_id": [2], "rating": [1.0], "timestamp": [10]}
    )


def _all_filters():
    from replay_tpu.preprocessing.filters import (
        ConsecutiveDuplicatesFilter,
        EntityDaysFilter,
        GlobalDaysFilter,
        InteractionEntriesFilter,
        LowRatingFilter,
        MinCountFilter,
        NumInteractionsFilter,
        QuantileItemsFilter,
        TimePeriodFilter,
    )

    return [
        pytest.param(MinCountFilter(2, groupby_column="query_id"), id="min_count"),
        pytest.param(LowRatingFilter(0.5), id="low_rating"),
        pytest.param(
            NumInteractionsFilter(1, query_column="query_id", item_column="item_id"),
            id="num_interactions",
        ),
        pytest.param(
            EntityDaysFilter(1, entity_column="query_id", timestamp_column="timestamp"),
            id="entity_days",
        ),
        pytest.param(GlobalDaysFilter(1, timestamp_column="timestamp"), id="global_days"),
        pytest.param(TimePeriodFilter(timestamp_column="timestamp"), id="time_period"),
        pytest.param(
            QuantileItemsFilter(query_column="query_id", item_column="item_id"),
            id="quantile_items",
        ),
        pytest.param(
            ConsecutiveDuplicatesFilter(
                query_column="query_id", item_column="item_id", timestamp_column="timestamp"
            ),
            id="consecutive_duplicates",
        ),
        pytest.param(
            InteractionEntriesFilter(query_column="query_id", item_column="item_id"),
            id="interaction_entries",
        ),
    ]


@pytest.mark.parametrize("filt", _all_filters())
@pytest.mark.parametrize("frame_fn", [empty_frame, one_row_frame], ids=["empty", "one-row"])
def test_filters_survive_edge_frames(filt, frame_fn):
    df = frame_fn()
    out = filt.transform(df)
    assert len(out) <= len(df)
    assert set(out.columns) == set(df.columns)


def _all_splitters():
    from replay_tpu.splitters import (
        ColdUserRandomSplitter,
        KFolds,
        LastNSplitter,
        NewUsersSplitter,
        RandomNextNSplitter,
        RandomSplitter,
        RatioSplitter,
        TimeSplitter,
        TwoStageSplitter,
    )

    q = dict(query_column="query_id")
    return [
        pytest.param(RatioSplitter(0.5, divide_column="query_id", **q), id="ratio"),
        pytest.param(TimeSplitter(0.5, **q), id="time"),
        pytest.param(LastNSplitter(1, divide_column="query_id", **q), id="last_n"),
        pytest.param(RandomSplitter(0.5, seed=0, **q), id="random"),
        pytest.param(RandomNextNSplitter(1, seed=0, divide_column="query_id", **q), id="random_next_n"),
        pytest.param(NewUsersSplitter(0.5, **q), id="new_users"),
        pytest.param(ColdUserRandomSplitter(0.5, seed=0, **q), id="cold_user_random"),
        pytest.param(TwoStageSplitter(0.5, 0.5, seed=0, first_divide_column="query_id", **q), id="two_stage"),
    ]


@pytest.mark.parametrize("splitter", _all_splitters())
def test_splitters_survive_one_row(splitter):
    df = one_row_frame()
    train, test = splitter.split(df)
    assert len(train) + len(test) <= 1
    assert set(train.columns) == set(df.columns)


def test_kfolds_survives_small_frames():
    from replay_tpu.splitters import KFolds

    df = pd.DataFrame(
        {"query_id": [1, 1, 2], "item_id": [1, 2, 3], "rating": 1.0, "timestamp": [1, 2, 3]}
    )
    folds = list(KFolds(n_folds=2, seed=0, query_column="query_id").split(df))
    assert len(folds) == 2
    for train, test in folds:
        assert len(train) + len(test) == len(df)
