"""Additional differential coverage: Sessionizer, Discretizer, remaining
filters, NewUsers/KFolds splitters, CSRConverter, merge_subsets."""

import numpy as np
import pandas as pd
import pytest


def _assert_frames_equal(mine, ref, msg=""):
    mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
    ref = ref.sort_values(list(mine.columns)).reset_index(drop=True)[mine.columns]
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False, obj=msg or "frame")


def test_sessionizer_matches_reference(reference, random_log):
    from replay.preprocessing import Sessionizer as Ref

    from replay_tpu.preprocessing import Sessionizer as Mine

    kwargs = dict(user_column="query_id", time_column="timestamp", session_gap=500)
    m = Mine(**kwargs).transform(random_log)
    r = Ref(**kwargs).transform(random_log)
    _assert_frames_equal(m, r, "sessionizer")


def test_sessionizer_with_limits_matches_reference(reference, random_log):
    from replay.preprocessing import Sessionizer as Ref

    from replay_tpu.preprocessing import Sessionizer as Mine

    kwargs = dict(
        user_column="query_id", time_column="timestamp", session_gap=800,
        min_inter_per_session=2, max_inter_per_session=6,
    )
    m = Mine(**kwargs).transform(random_log)
    r = Ref(**kwargs).transform(random_log)
    _assert_frames_equal(m, r, "sessionizer limits")


@pytest.mark.parametrize("n_bins", [3, 7])
def test_quantile_discretizer_matches_reference(reference, random_log, n_bins):
    from replay.preprocessing import Discretizer as RefD
    from replay.preprocessing import QuantileDiscretizingRule as RefQ

    from replay_tpu.preprocessing import Discretizer as MyD
    from replay_tpu.preprocessing import QuantileDiscretizingRule as MyQ

    log = random_log.copy()
    log["value"] = np.random.default_rng(3).normal(size=len(log))
    m = MyD([MyQ("value", n_bins=n_bins)]).fit_transform(log)
    r = RefD([RefQ("value", n_bins=n_bins)]).fit_transform(log)
    np.testing.assert_array_equal(
        m.sort_values(["query_id", "item_id"])["value"].to_numpy(),
        r.sort_values(["query_id", "item_id"])["value"].to_numpy(),
    )


def test_greedy_discretizer_matches_reference(reference, random_log):
    from replay.preprocessing import Discretizer as RefD
    from replay.preprocessing import GreedyDiscretizingRule as RefG

    from replay_tpu.preprocessing import Discretizer as MyD
    from replay_tpu.preprocessing import GreedyDiscretizingRule as MyG

    log = random_log.copy()
    # heavily-tied values: the regime the greedy rule exists for
    log["value"] = np.random.default_rng(4).integers(0, 8, size=len(log)).astype(float)
    m = MyD([MyG("value", n_bins=4)]).fit_transform(log)
    r = RefD([RefG("value", n_bins=4)]).fit_transform(log)
    np.testing.assert_array_equal(
        m.sort_values(["query_id", "item_id"])["value"].to_numpy(),
        r.sort_values(["query_id", "item_id"])["value"].to_numpy(),
    )


class TestMoreFiltersParity:
    def test_global_days_filter(self, reference, random_log):
        from replay.preprocessing.filters import GlobalDaysFilter as Ref

        from replay_tpu.preprocessing.filters import GlobalDaysFilter as Mine

        log = random_log.copy()
        log["timestamp"] = pd.to_datetime(log["timestamp"], unit="s")
        kwargs = dict(days=1, first=True, timestamp_column="timestamp")
        _assert_frames_equal(Mine(**kwargs).transform(log), Ref(**kwargs).transform(log))

    def test_time_period_filter(self, reference, random_log):
        from replay.preprocessing.filters import TimePeriodFilter as Ref

        from replay_tpu.preprocessing.filters import TimePeriodFilter as Mine

        log = random_log.copy()
        log["timestamp"] = pd.to_datetime(log["timestamp"], unit="s")
        kwargs = dict(
            start_date="1970-01-01 00:10:00", end_date="1970-01-01 02:00:00",
            timestamp_column="timestamp",
        )
        _assert_frames_equal(Mine(**kwargs).transform(log), Ref(**kwargs).transform(log))

    def test_consecutive_duplicates_filter(self, reference, random_log):
        from replay.preprocessing.filters import ConsecutiveDuplicatesFilter as Ref

        from replay_tpu.preprocessing.filters import ConsecutiveDuplicatesFilter as Mine

        log = pd.concat([random_log, random_log.head(200)]).sort_values(
            ["query_id", "timestamp"], kind="stable"
        )
        kwargs = dict(query_column="query_id", item_column="item_id",
                      timestamp_column="timestamp")
        _assert_frames_equal(Mine(**kwargs).transform(log), Ref(**kwargs).transform(log))

    def test_interaction_entries_filter(self, reference, random_log):
        from replay.preprocessing.filters import InteractionEntriesFilter as Ref

        from replay_tpu.preprocessing.filters import InteractionEntriesFilter as Mine

        kwargs = dict(query_column="query_id", item_column="item_id",
                      min_inter_per_user=5, max_inter_per_user=25,
                      min_inter_per_item=3)
        _assert_frames_equal(Mine(**kwargs).transform(random_log), Ref(**kwargs).transform(random_log))


class TestMoreSplittersParity:
    def test_new_users_splitter(self, reference, random_log):
        from replay.splitters import NewUsersSplitter as Ref

        from replay_tpu.splitters import NewUsersSplitter as Mine

        kwargs = dict(test_size=0.3, query_column="query_id",
                      timestamp_column="timestamp")
        mtr, mte = Mine(**kwargs).split(random_log)
        rtr, rte = Ref(**kwargs).split(random_log)
        _assert_frames_equal(mtr, rtr, "new users train")
        _assert_frames_equal(mte, rte, "new users test")

    def test_two_stage_splitter(self, reference, random_log):
        from replay.splitters import TwoStageSplitter as Ref

        from replay_tpu.splitters import TwoStageSplitter as Mine

        kwargs = dict(
            first_divide_size=0.2, second_divide_size=0.5, seed=7,
            query_column="query_id", item_column="item_id",
            timestamp_column="timestamp", shuffle=False,
        )
        mtr, mte = Mine(**kwargs).split(random_log)
        try:
            rtr, rte = Ref(**kwargs).split(random_log)
        except TypeError:
            pytest.skip(
                "reference TwoStageSplitter crashes on pandas 3.x "
                "(two_stage_splitter.py:207 inplace chained assignment)"
            )
        _assert_frames_equal(mtr, rtr, "two stage train")
        _assert_frames_equal(mte, rte, "two stage test")


def test_csr_converter_matches_reference(reference, random_log):
    from replay.preprocessing import CSRConverter as Ref

    from replay_tpu.preprocessing import CSRConverter as Mine

    kwargs = dict(first_dim_column="query_id", second_dim_column="item_id",
                  data_column="rating")
    m = Mine(**kwargs).transform(random_log)
    r = Ref(**kwargs).transform(random_log)
    assert m.shape == r.shape
    np.testing.assert_array_equal(m.toarray(), r.toarray())


@pytest.mark.parametrize("on_duplicate", ["drop", "ignore"])
def test_merge_subsets_matches_reference(reference, random_log, on_duplicate):
    from replay.preprocessing.utils import merge_subsets as ref_merge

    from replay_tpu.preprocessing import merge_subsets as my_merge

    a = random_log.iloc[:1500]
    b = random_log.iloc[1200:]  # overlap → duplicates
    m = my_merge([a, b], on_duplicate=on_duplicate,
                 subset_for_duplicates=["query_id", "item_id"])
    r = ref_merge([a, b], on_duplicate=on_duplicate,
                  subset_for_duplicates=["query_id", "item_id"])
    _assert_frames_equal(m, r, f"merge {on_duplicate}")


def test_merge_subsets_error_on_duplicates(reference, random_log):
    from replay.preprocessing.utils import merge_subsets as ref_merge

    from replay_tpu.preprocessing import merge_subsets as my_merge

    a, b = random_log.iloc[:1500], random_log.iloc[1200:]
    with pytest.raises(ValueError):
        my_merge([a, b], on_duplicate="error", subset_for_duplicates=["query_id", "item_id"])
    with pytest.raises(ValueError):
        ref_merge([a, b], on_duplicate="error", subset_for_duplicates=["query_id", "item_id"])


class TestSeededSplittersParity:
    """The four stochastic splitters: identical pandas RNG calls → the
    split frames must match the reference BITWISE at equal seeds."""

    def test_random_splitter(self, reference, random_log):
        from replay.splitters import RandomSplitter as Ref

        from replay_tpu.splitters import RandomSplitter as Mine

        kwargs = dict(test_size=0.25, seed=13, query_column="query_id",
                      item_column="item_id")
        mtr, mte = Mine(**kwargs).split(random_log)
        rtr, rte = Ref(**kwargs).split(random_log)
        _assert_frames_equal(mtr, rtr, "random train")
        _assert_frames_equal(mte, rte, "random test")

    def test_cold_user_random_splitter(self, reference, random_log):
        from replay.splitters import ColdUserRandomSplitter as Ref

        from replay_tpu.splitters import ColdUserRandomSplitter as Mine

        kwargs = dict(test_size=0.3, seed=5, query_column="query_id",
                      item_column="item_id")
        mtr, mte = Mine(**kwargs).split(random_log)
        # test users must be disjoint from train users (the splitter's point)
        assert not set(mte["query_id"]) & set(mtr["query_id"])
        try:
            rtr, rte = Ref(**kwargs).split(random_log)
        except TypeError:
            pytest.skip(
                "reference ColdUserRandomSplitter crashes on pandas 3.x "
                "(cold_user_random_splitter.py:69 inplace chained assignment)"
            )
        _assert_frames_equal(mtr, rtr, "cold-user train")
        _assert_frames_equal(mte, rte, "cold-user test")

    def test_k_folds(self, reference, random_log):
        from replay.splitters import KFolds as Ref

        from replay_tpu.splitters import KFolds as Mine

        kwargs = dict(n_folds=3, seed=11, query_column="query_id",
                      item_column="item_id")
        mine_folds = list(Mine(**kwargs).split(random_log))
        ref_folds = list(Ref(**kwargs).split(random_log))
        assert len(mine_folds) == len(ref_folds) == 3
        # Bitwise fold equality is unattainable by design: the reference
        # round-robins folds over a pandas DEFAULT (unstable quicksort)
        # sort that scrambles its own shuffle; we preserve the shuffle with
        # a stable sort. Assert the CONTRACT instead: equal per-fold sizes,
        # disjoint train/test, folds partition each user's rows.
        for i, ((mtr, mte), (rtr, rte)) in enumerate(zip(mine_folds, ref_folds)):
            assert len(mtr) + len(mte) == len(rtr) + len(rte), f"fold {i}"
            m_counts = mte.groupby("query_id").size().sort_index()
            r_counts = rte.groupby("query_id").size().sort_index()
            pd.testing.assert_series_equal(m_counts, r_counts, obj=f"fold {i} sizes")
            merged = mtr.merge(mte, on=["query_id", "item_id", "timestamp"])
            assert merged.empty, f"fold {i} train/test overlap"

    def test_random_next_n(self, reference, random_log):
        from replay.splitters import RandomNextNSplitter as Ref

        from replay_tpu.splitters import RandomNextNSplitter as Mine

        kwargs = dict(N=2, seed=3, query_column="query_id",
                      item_column="item_id", timestamp_column="timestamp")
        # unique timestamps: with ties the reference's unstable default sort
        # orders tied rows arbitrarily; tie-free logs compare bitwise
        log = random_log.copy()
        log["timestamp"] = np.arange(len(log)) + log["timestamp"] * len(log)
        mtr, mte = Mine(**kwargs).split(log)
        rtr, rte = Ref(**kwargs).split(log)
        _assert_frames_equal(mtr, rtr, "random-next-n train")
        _assert_frames_equal(mte, rte, "random-next-n test")
