"""All-filter differential grid vs the reference pandas backend: every
filter × ≥3 param combos must produce frame-identical outputs (the same
depth treatment the splitter grid got in round 5).

reference: replay/preprocessing/filters.py
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity


def _eq(mine, ref, msg=""):
    assert len(mine) == len(ref), f"{msg}: row counts {len(mine)} vs {len(ref)}"
    cols = list(mine.columns)
    pd.testing.assert_frame_equal(
        mine.sort_values(cols).reset_index(drop=True),
        ref.sort_values(cols)[cols].reset_index(drop=True),
        check_dtype=False, obj=msg or "frame",
    )


@pytest.fixture()
def filter_log():
    rng = np.random.default_rng(17)
    n = 3000
    frame = pd.DataFrame(
        {
            "user_id": rng.integers(0, 120, n),
            "item_id": rng.integers(0, 250, n),
            "rating": rng.integers(1, 6, n).astype(float),
            "timestamp": pd.to_datetime(
                rng.integers(1_600_000_000, 1_603_000_000, n), unit="s"
            ),
        }
    )
    return frame.reset_index(drop=True)


def _pair(name):
    import importlib

    ref_mod = importlib.import_module("replay.preprocessing.filters")
    mine_mod = importlib.import_module("replay_tpu.preprocessing.filters")
    return getattr(mine_mod, name), getattr(ref_mod, name)


@pytest.mark.parametrize("kw", [
    {"min_inter_per_user": 10},
    {"max_inter_per_user": 30},
    {"min_inter_per_user": 5, "max_inter_per_user": 40},
    {"min_inter_per_item": 8, "max_inter_per_item": 25},
    {"min_inter_per_user": 12, "min_inter_per_item": 10},  # iterative cascade
])
def test_interaction_entries_grid(reference, filter_log, kw):
    Mine, Ref = _pair("InteractionEntriesFilter")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"entries {kw}")


@pytest.mark.parametrize("kw", [
    {"num_entries": 2},
    {"num_entries": 25},
    {"num_entries": 10, "groupby_column": "item_id"},
])
def test_min_count_grid(reference, filter_log, kw):
    Mine, Ref = _pair("MinCountFilter")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"mincount {kw}")


@pytest.mark.parametrize("value", [1.5, 3.0, 5.0])
def test_low_rating_grid(reference, filter_log, value):
    Mine, Ref = _pair("LowRatingFilter")
    kw = {"value": value, "rating_column": "rating"}
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"lowrating {value}")


@pytest.mark.parametrize("kw", [
    {"num_interactions": 5, "first": True},
    {"num_interactions": 5, "first": False},
    {"num_interactions": 1, "first": True},
    {"num_interactions": 12, "first": False, "item_column": "item_id"},
])
def test_num_interactions_grid(reference, filter_log, kw):
    Mine, Ref = _pair("NumInteractionsFilter")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"numinter {kw}")


@pytest.mark.parametrize("kw", [
    {"days": 3, "first": True},
    {"days": 3, "first": False},
    {"days": 14, "first": True, "entity_column": "item_id"},
])
def test_entity_days_grid(reference, filter_log, kw):
    Mine, Ref = _pair("EntityDaysFilter")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"entitydays {kw}")


@pytest.mark.parametrize("kw", [
    {"days": 2, "first": True},
    {"days": 2, "first": False},
    {"days": 30, "first": True},
])
def test_global_days_grid(reference, filter_log, kw):
    Mine, Ref = _pair("GlobalDaysFilter")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"globaldays {kw}")


@pytest.mark.parametrize("kw", [
    {"start_date": "2020-09-20 00:00:00"},
    {"end_date": "2020-10-05 00:00:00"},
    {"start_date": "2020-09-18 00:00:00", "end_date": "2020-10-10 00:00:00"},
])
def test_time_period_grid(reference, filter_log, kw):
    Mine, Ref = _pair("TimePeriodFilter")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"timeperiod {kw}")


@pytest.mark.parametrize("kw", [
    {"alpha_quantile": 0.95, "items_proportion": 0.5},
    {"alpha_quantile": 0.99, "items_proportion": 0.2},
    {"alpha_quantile": 0.8, "items_proportion": 0.8},
])
def test_quantile_items_grid(reference, filter_log, kw):
    Mine, Ref = _pair("QuantileItemsFilter")
    kw = dict(kw, query_column="user_id", item_column="item_id")
    _eq(Mine(**kw).transform(filter_log), Ref(**kw).transform(filter_log),
        f"quantile {kw}")


@pytest.mark.parametrize("keep", ["first", "last"])
def test_consecutive_duplicates_grid(reference, filter_log, keep):
    Mine, Ref = _pair("ConsecutiveDuplicatesFilter")
    log = filter_log.sort_values(["user_id", "timestamp"]).reset_index(drop=True)
    kw = {"keep": keep, "query_column": "user_id", "item_column": "item_id",
          "timestamp_column": "timestamp"}
    _eq(Mine(**kw).transform(log), Ref(**kw).transform(log),
        f"consecdup {keep}")
