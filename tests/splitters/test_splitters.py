import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

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


@pytest.fixture()
def log():
    return pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3],
            "item_id": [1, 2, 3, 4, 5, 1, 2, 3, 9, 10, 1, 5, 3, 1, 2],
            "timestamp": pd.to_datetime(
                [
                    "2020-01-01", "2020-01-02", "2020-01-03", "2020-01-04", "2020-01-05",
                    "2020-01-06", "2020-01-07", "2020-01-08", "2020-01-09", "2020-01-10",
                    "2020-01-01", "2020-01-02", "2020-01-03", "2020-01-04", "2020-01-05",
                ]
            ),
        }
    )


def test_ratio_splitter_fractions(log):
    train, test = RatioSplitter(test_size=0.5).split(log)
    assert len(train) == 6
    assert len(test) == 9
    # per user: first 2 in train, last 3 in test
    assert train.groupby("query_id").size().tolist() == [2, 2, 2]


def test_ratio_splitter_not_by_fractions(log):
    train, test = RatioSplitter(test_size=0.5, split_by_fractions=False).split(log)
    assert train.groupby("query_id").size().tolist() == [3, 3, 3]


def test_ratio_splitter_min_interactions(log):
    train, test = RatioSplitter(test_size=0.5, min_interactions_per_group=10).split(log)
    assert len(test) == 0


def test_time_splitter_datetime(log):
    train, test = TimeSplitter(pd.Timestamp("2020-01-04")).split(log)
    assert (train["timestamp"] < "2020-01-04").all()
    assert (test["timestamp"] >= "2020-01-04").all()


def test_time_splitter_ratio(log):
    train, test = TimeSplitter(0.2).split(log)
    assert len(train) + len(test) == len(log)
    assert train["timestamp"].max() <= test["timestamp"].min()


def test_last_n_splitter(log):
    train, test = LastNSplitter(N=2, divide_column="query_id").split(log)
    assert test.groupby("query_id").size().tolist() == [2, 2, 2]


def test_last_n_timedelta(log):
    train, test = LastNSplitter(
        N=86400, divide_column="query_id", strategy="timedelta"
    ).split(log)
    # last day (exclusive boundary) per user -> exactly last interaction
    assert test.groupby("query_id").size().tolist() == [1, 1, 1]


def test_random_splitter(log):
    train, test = RandomSplitter(test_size=0.4, seed=13).split(log)
    assert len(train) + len(test) == len(log)
    assert len(train) == 9


def test_random_splitter_bad_size():
    with pytest.raises(ValueError):
        RandomSplitter(test_size=1.5)


def test_new_users_splitter(log):
    train, test = NewUsersSplitter(test_size=0.3).split(log)
    # user 2 starts last -> in test
    assert set(test["query_id"]) == {2}
    assert (train["timestamp"] < test["timestamp"].min()).all()


def test_cold_user_random_splitter(log):
    train, test = ColdUserRandomSplitter(test_size=0.34, seed=7).split(log)
    train_users = set(train["query_id"])
    test_users = set(test["query_id"])
    assert train_users.isdisjoint(test_users)
    assert len(test_users) == 1


def test_random_next_n_splitter(log):
    train, test = RandomNextNSplitter(N=1, seed=3).split(log)
    assert test.groupby("query_id").size().max() == 1
    assert len(train) + len(test) <= len(log)


def test_two_stage_splitter(log):
    train, test = TwoStageSplitter(
        first_divide_size=1, second_divide_size=2, seed=4
    ).split(log)
    assert len(test) == 2
    assert test["query_id"].nunique() == 1
    assert len(train) == len(log) - 2


def test_k_folds(log):
    folds = list(KFolds(n_folds=2, seed=11).split(log))
    assert len(folds) == 2
    for train, test in folds:
        assert len(train) + len(test) == len(log)


def test_drop_cold(log):
    # make item 10 appear only in the test region
    train, test = RatioSplitter(test_size=0.5, drop_cold_items=True).split(log)
    assert set(test["item_id"]).issubset(set(train["item_id"]))


def test_session_id_handling():
    df = pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1],
            "item_id": [1, 2, 3, 4],
            "timestamp": [1, 2, 3, 4],
            "session_id": [1, 1, 2, 2],
        }
    )
    train, test = RatioSplitter(
        test_size=0.5, session_id_column="session_id"
    ).split(df)
    # sessions must not be split
    assert set(train["session_id"]).isdisjoint(set(test["session_id"]))


def test_splitter_save_load(tmp_path, log):
    splitter = RatioSplitter(test_size=0.5)
    splitter.save(str(tmp_path / "sp"))
    loaded = RatioSplitter.load(str(tmp_path / "sp"))
    t1, _ = splitter.split(log)
    t2, _ = loaded.split(log)
    pd.testing.assert_frame_equal(t1, t2)
