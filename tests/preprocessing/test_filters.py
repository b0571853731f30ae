import pytest as _pytest

pytestmark = _pytest.mark.core

import pandas as pd
import pytest

from replay_tpu.preprocessing import (
    ConsecutiveDuplicatesFilter,
    EntityDaysFilter,
    GlobalDaysFilter,
    InteractionEntriesFilter,
    LowRatingFilter,
    MinCountFilter,
    NumInteractionsFilter,
    QuantileItemsFilter,
    TimePeriodFilter,
    filter_cold,
)


@pytest.fixture()
def log():
    df = pd.DataFrame(
        {
            "user_id": ["u1", "u2", "u2", "u3", "u3", "u3"],
            "item_id": ["i1", "i2", "i3", "i1", "i2", "i3"],
            "rating": [1.0, 0.5, 3.0, 1.0, 0.0, 1.0],
            "timestamp": pd.to_datetime(
                [
                    "2020-01-01 23:59:59",
                    "2020-02-01 00:00:00",
                    "2020-02-01 00:00:01",
                    "2020-01-01 00:04:15",
                    "2020-01-02 00:04:14",
                    "2020-01-05 23:59:59",
                ]
            ),
        }
    )
    return df


def test_min_count_filter():
    df = pd.DataFrame({"user_id": [1, 1, 2]})
    out = MinCountFilter(2).transform(df)
    assert out["user_id"].tolist() == [1, 1]


def test_low_rating_filter():
    df = pd.DataFrame({"rating": [1, 5, 3.5, 4]})
    out = LowRatingFilter(3.5).transform(df)
    assert out["rating"].tolist() == [5, 3.5, 4]


def test_interaction_entries_filter():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 3, 3],
            "item_id": [3, 7, 10, 5, 8, 11, 4, 9, 2, 5],
            "rating": [1, 2, 3, 3, 2, 1, 3, 12, 1, 4],
        }
    )
    out = InteractionEntriesFilter(min_inter_per_user=4).transform(df)
    assert out["user_id"].unique().tolist() == [3]


def test_num_interactions_first_last(log):
    first = NumInteractionsFilter(1, True, query_column="user_id").transform(log)
    assert set(first["item_id"]) == {"i1", "i2"}
    last = NumInteractionsFilter(1, False, query_column="user_id").transform(log)
    assert set(last["item_id"]) == {"i1", "i3"}


def test_entity_days_filter_first(log):
    out = EntityDaysFilter(1, True, entity_column="user_id").transform(log)
    # u3's last interaction (01-05) is dropped
    assert len(out) == 5
    assert "2020-01-05" not in out["timestamp"].astype(str).str.cat()


def test_global_days_filter(log):
    out = GlobalDaysFilter(1).transform(log)
    assert len(out) == 3
    out_last = GlobalDaysFilter(1, first=False).transform(log)
    assert set(out_last["user_id"]) == {"u2"}


def test_time_period_filter(log):
    out = TimePeriodFilter(
        start_date="2020-01-01 14:00:00", end_date="2020-01-03 00:00:00"
    ).transform(log)
    assert len(out) == 2


def test_quantile_items_filter():
    df = pd.DataFrame(
        {"user_id": [0, 0, 1, 2, 2, 2, 2], "item_id": [0, 2, 1, 1, 2, 2, 2]}
    )
    out = QuantileItemsFilter(query_column="user_id").transform(df)
    assert len(out) == 6


def test_consecutive_duplicates_filter():
    import datetime as dt

    df = pd.DataFrame(
        {
            "user_id": ["u0", "u1", "u1", "u0", "u0", "u0", "u1", "u0"],
            "item_id": ["i0", "i1", "i1", "i2", "i0", "i1", "i2", "i1"],
            "timestamp": [dt.datetime(2024, 1, 1) + dt.timedelta(days=i) for i in range(8)],
        }
    )
    out = ConsecutiveDuplicatesFilter(query_column="user_id").transform(df)
    assert len(out) == 6


def test_filter_cold():
    target = pd.DataFrame({"query_id": [1, 2], "item_id": [10, 20]})
    ref = pd.DataFrame({"query_id": [1], "item_id": [10]})
    out = filter_cold(target, ref, mode="both")
    assert len(out) == 1
    with pytest.raises(ValueError):
        filter_cold(target, ref, mode="bogus")


# ------------------------------------------------- edge inputs (fuzz finds)


class TestEdgeInputs:
    def test_days_filters_accept_int_second_timestamps(self):
        """The framework's canonical timestamps are unix seconds; a days
        window must work in that unit too (reference only documents the
        datetime case)."""
        from replay_tpu.preprocessing import EntityDaysFilter, GlobalDaysFilter

        log = pd.DataFrame(
            {"user_id": [1, 1, 2], "item_id": [1, 2, 3],
             "timestamp": [0, 86400 * 2, 86400 * 20]}
        )
        assert GlobalDaysFilter(3, True).transform(log)["timestamp"].tolist() == [0, 86400 * 2]
        assert GlobalDaysFilter(3, False).transform(log)["timestamp"].tolist() == [86400 * 20]
        assert len(EntityDaysFilter(3, True).transform(log)) == 3
        dlog = log.assign(timestamp=pd.to_datetime(log["timestamp"], unit="s"))
        assert len(GlobalDaysFilter(3, True).transform(dlog)) == 2
        assert len(EntityDaysFilter(1, True).transform(dlog)) == 2

    def test_days_filters_empty_frame(self):
        from replay_tpu.preprocessing import EntityDaysFilter, GlobalDaysFilter

        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "timestamp": pd.Series([], dtype="int64")}
        )
        assert GlobalDaysFilter(1).transform(empty).empty
        assert EntityDaysFilter(1).transform(empty).empty

    def test_time_splitter_empty_frame(self):
        from replay_tpu.splitters import TimeSplitter

        empty = pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "item_id": pd.Series([], dtype="int64"),
             "timestamp": pd.Series([], dtype="int64")}
        )
        tr, te = TimeSplitter(0.5).split(empty)
        assert tr.empty and te.empty

    def test_discretizer_empty_fit_raises(self):
        from replay_tpu.preprocessing import (
            Discretizer,
            GreedyDiscretizingRule,
            QuantileDiscretizingRule,
        )

        empty = pd.DataFrame({"rating": pd.Series([], dtype="float64")})
        for rule_cls in (QuantileDiscretizingRule, GreedyDiscretizingRule):
            with pytest.raises(ValueError, match="no valid values"):
                Discretizer([rule_cls("rating", n_bins=2)]).fit(empty)
