"""All-9-splitter differential grid vs the reference pandas backend
(round-4 verdict item 4): every splitter family × ≥4 param combos
(drop-cold flags, session column + both strategies, ratio/size edges,
seeds) must produce frame-identical splits.

Seeded splitters share the reference's RNG *sequence* (pandas
``sample(random_state)`` / ``RandomState(seed).randint``), so exact frame
parity — not just statistics — is the assertion.

reference: replay/splitters/{random,cold_user_random,k_folds,
random_next_n,new_users,two_stage,ratio,time,last_n}_splitter.py
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

KEY = ["query_id", "item_id", "timestamp"]


def _eq(mine, ref, msg=""):
    assert len(mine) == len(ref), f"{msg}: row counts {len(mine)} vs {len(ref)}"
    m = mine.sort_values(list(mine.columns)).reset_index(drop=True)
    r = ref.sort_values(list(ref.columns))[list(mine.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(m, r, check_dtype=False, obj=msg or "frame")


def _eq_pair(mine_pair, ref_pair, msg=""):
    _eq(mine_pair[0], ref_pair[0], f"{msg} train")
    _eq(mine_pair[1], ref_pair[1], f"{msg} test")


@pytest.fixture()
def grid_log():
    rng = np.random.default_rng(31)
    n = 3000
    frame = pd.DataFrame(
        {
            "query_id": rng.integers(0, 200, n),
            "item_id": rng.integers(0, 400, n),
            "timestamp": rng.permutation(n),  # unique → order-stable parity
            "rating": rng.integers(1, 6, n).astype(float),
            "session_id": rng.integers(0, 30, n),
        }
    )
    return frame.reset_index(drop=True)


# --- RandomSplitter ---------------------------------------------------------

@pytest.mark.parametrize("test_size", [0.0, 0.2, 0.5, 1.0])
@pytest.mark.parametrize("seed", [17, 42])
def test_random_splitter_sizes(reference, grid_log, test_size, seed):
    from replay.splitters import RandomSplitter as Ref

    from replay_tpu.splitters import RandomSplitter as Mine

    kw = dict(test_size=test_size, seed=seed, query_column="query_id",
              item_column="item_id")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"random {test_size}/{seed}")


@pytest.mark.parametrize("drop_users,drop_items",
                         [(True, False), (False, True), (True, True)])
def test_random_splitter_drop_cold(reference, grid_log, drop_users, drop_items):
    from replay.splitters import RandomSplitter as Ref

    from replay_tpu.splitters import RandomSplitter as Mine

    kw = dict(test_size=0.4, seed=3, drop_cold_users=drop_users,
              drop_cold_items=drop_items, query_column="query_id",
              item_column="item_id")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"random dropcold {drop_users}/{drop_items}")


# --- ColdUserRandomSplitter -------------------------------------------------
#
# The reference's own pandas path raises TypeError on pandas 3.x: its chained
# ``interactions["is_test"].fillna(True, inplace=True)``
# (cold_user_random_splitter.py:69) no-ops under Copy-on-Write, leaving NaN in
# a float column that the next ``~`` chokes on.  The subclass below repairs
# ONLY that statement (non-chained fillna), preserving the RNG call and every
# other statement, so the comparison still executes the reference's own split
# logic.


def _cow_safe_cold_user(ref_cls):
    import pandas as _pd

    class _CowSafe(ref_cls):
        def _core_split_pandas(self, interactions, threshold):
            users = _pd.DataFrame(
                interactions[self.query_column].unique(),
                columns=[self.query_column],
            )
            train_users = users.sample(frac=(1 - threshold), random_state=self.seed)
            train_users["is_test"] = False
            interactions = interactions.merge(
                train_users, on=self.query_column, how="left"
            )
            interactions["is_test"] = interactions["is_test"].fillna(True).astype(bool)
            train = interactions[~interactions["is_test"]].drop(columns=["is_test"])
            test = interactions[interactions["is_test"]].drop(columns=["is_test"])
            return train, test

    return _CowSafe


@pytest.mark.parametrize("test_size", [0.2, 0.5, 0.8])
@pytest.mark.parametrize("seed", [3, 42])
def test_cold_user_random(reference, grid_log, test_size, seed):
    from replay.splitters import ColdUserRandomSplitter as Ref

    from replay_tpu.splitters import ColdUserRandomSplitter as Mine

    kw = dict(test_size=test_size, seed=seed, query_column="query_id",
              item_column="item_id")
    _eq_pair(Mine(**kw).split(grid_log),
             _cow_safe_cold_user(Ref)(**kw).split(grid_log),
             f"colduser {test_size}/{seed}")


def test_cold_user_random_drop_items(reference, grid_log):
    from replay.splitters import ColdUserRandomSplitter as Ref

    from replay_tpu.splitters import ColdUserRandomSplitter as Mine

    kw = dict(test_size=0.3, seed=11, drop_cold_items=True,
              query_column="query_id", item_column="item_id")
    _eq_pair(Mine(**kw).split(grid_log),
             _cow_safe_cold_user(Ref)(**kw).split(grid_log),
             "colduser dropitems")


# --- KFolds -----------------------------------------------------------------

@pytest.mark.parametrize("n_folds", [2, 5])
@pytest.mark.parametrize("seed", [1, 42])
def test_k_folds_all_folds(reference, grid_log, n_folds, seed):
    from replay.splitters import KFolds as Ref

    from replay_tpu.splitters import KFolds as Mine

    kw = dict(n_folds=n_folds, seed=seed, query_column="query_id",
              item_column="item_id", timestamp_column="timestamp")
    mine_folds = list(Mine(**kw).split(grid_log))
    ref_folds = list(Ref(**kw).split(grid_log))
    assert len(mine_folds) == len(ref_folds) == n_folds
    for i, (m, r) in enumerate(zip(mine_folds, ref_folds)):
        _eq_pair(m, r, f"kfolds {n_folds}/{seed} fold {i}")


@pytest.mark.parametrize("strategy", ["train", "test"])
def test_k_folds_sessions(reference, grid_log, strategy):
    from replay.splitters import KFolds as Ref

    from replay_tpu.splitters import KFolds as Mine

    kw = dict(n_folds=3, seed=9, query_column="query_id",
              item_column="item_id", timestamp_column="timestamp",
              session_id_column="session_id",
              session_id_processing_strategy=strategy)
    for i, (m, r) in enumerate(zip(Mine(**kw).split(grid_log),
                                   Ref(**kw).split(grid_log))):
        _eq_pair(m, r, f"kfolds sessions {strategy} fold {i}")


def test_k_folds_drop_cold(reference, grid_log):
    from replay.splitters import KFolds as Ref

    from replay_tpu.splitters import KFolds as Mine

    kw = dict(n_folds=4, seed=5, drop_cold_users=True, drop_cold_items=True,
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    for i, (m, r) in enumerate(zip(Mine(**kw).split(grid_log),
                                   Ref(**kw).split(grid_log))):
        _eq_pair(m, r, f"kfolds dropcold fold {i}")


# --- RandomNextNSplitter ----------------------------------------------------

@pytest.mark.parametrize("n", [1, 3, None])
@pytest.mark.parametrize("seed", [7, 42])
def test_random_next_n(reference, grid_log, n, seed):
    from replay.splitters import RandomNextNSplitter as Ref

    from replay_tpu.splitters import RandomNextNSplitter as Mine

    kw = dict(N=n, seed=seed, divide_column="query_id",
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"randomnextn {n}/{seed}")


@pytest.mark.parametrize("strategy", ["train", "test"])
def test_random_next_n_sessions(reference, grid_log, strategy):
    from replay.splitters import RandomNextNSplitter as Ref

    from replay_tpu.splitters import RandomNextNSplitter as Mine

    kw = dict(N=2, seed=13, divide_column="query_id",
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp", session_id_column="session_id",
              session_id_processing_strategy=strategy)
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"randomnextn sessions {strategy}")


@pytest.mark.parametrize("drop_users,drop_items",
                         [(True, False), (False, True), (True, True)])
def test_random_next_n_drop_cold(reference, grid_log, drop_users, drop_items):
    from replay.splitters import RandomNextNSplitter as Ref

    from replay_tpu.splitters import RandomNextNSplitter as Mine

    kw = dict(N=2, seed=21, divide_column="query_id",
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp", drop_cold_users=drop_users,
              drop_cold_items=drop_items)
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"randomnextn dropcold {drop_users}/{drop_items}")


# --- NewUsersSplitter -------------------------------------------------------

@pytest.mark.parametrize("test_size", [0.1, 0.25, 0.5])
def test_new_users_sizes(reference, grid_log, test_size):
    from replay.splitters import NewUsersSplitter as Ref

    from replay_tpu.splitters import NewUsersSplitter as Mine

    kw = dict(test_size=test_size, query_column="query_id",
              item_column="item_id", timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"newusers {test_size}")


@pytest.mark.parametrize("strategy", ["train", "test"])
def test_new_users_sessions(reference, grid_log, strategy):
    """DOCUMENTED DIVERGENCE: the reference's pandas session path
    (new_users_splitter.py:123-127) does ``interactions.loc[test.index]``
    where ``test`` just came out of a ``merge`` — its index is a fresh
    RangeIndex, so the reference marks the first len(test) arbitrary ROWS of
    the log as test instead of the actual new-user rows (its Spark backend
    joins on query id and is correct).  We follow the intended semantics, so
    the expectation here is computed from the reference's own non-session
    split (which IS parity-tested above) + the reference's session-recalc
    rule (first/last flag per (query, session) group in frame order)."""
    from replay.splitters import NewUsersSplitter as Ref

    from replay_tpu.splitters import NewUsersSplitter as Mine

    base = dict(test_size=0.3, query_column="query_id", item_column="item_id",
                timestamp_column="timestamp")
    mtr, mte = Mine(**base, session_id_column="session_id",
                    session_id_processing_strategy=strategy).split(grid_log)

    # intended flags: actual test rows from the reference's (correct)
    # non-session pandas split, then the reference's recalc rule
    # (membership, not .index — the reference's merge output carries a fresh
    # RangeIndex; test = all rows of the new users)
    _, ref_test = Ref(**base).split(grid_log)
    marked = grid_log.copy()
    marked["is_test"] = marked["query_id"].isin(ref_test["query_id"].unique())
    agg = "first" if strategy == "train" else "last"
    marked["is_test"] = marked.groupby(["query_id", "session_id"])["is_test"].transform(agg)
    _eq(mtr, marked[~marked["is_test"]].drop(columns=["is_test"]),
        f"newusers sessions {strategy} train")
    _eq(mte, marked[marked["is_test"]].drop(columns=["is_test"]),
        f"newusers sessions {strategy} test")


def test_new_users_drop_cold_items(reference, grid_log):
    from replay.splitters import NewUsersSplitter as Ref

    from replay_tpu.splitters import NewUsersSplitter as Mine

    kw = dict(test_size=0.4, drop_cold_items=True, query_column="query_id",
              item_column="item_id", timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             "newusers dropitems")


# --- TwoStageSplitter -------------------------------------------------------
#
# The reference's pandas paths (two_stage_splitter.py:297,345) chain
# ``res["is_test"].fillna(False, inplace=True)`` — a no-op under pandas-3
# CoW, so the float NaN column crashes the next ``~``.  Pre-filling is_test
# in the partition helpers (exactly what the dead statement would have done)
# lets the reference's own split logic run unmodified otherwise.


def _cow_safe_two_stage(ref_cls):
    class _CowSafe(ref_cls):
        @staticmethod
        def _prefill(res):
            if "is_test" in res.columns:
                res["is_test"] = res["is_test"].fillna(False).astype(bool)
            return res

        def _add_random_partition_pandas(self, *a, **k):
            return self._prefill(super()._add_random_partition_pandas(*a, **k))

        def _add_time_partition_pandas(self, *a, **k):
            return self._prefill(super()._add_time_partition_pandas(*a, **k))

    return _CowSafe


@pytest.mark.parametrize("first,second", [(1, 2), (0.3, 2), (0.3, 0.5), (5, 0.4)])
def test_two_stage_sizes(reference, grid_log, first, second):
    from replay.splitters import TwoStageSplitter as Ref

    from replay_tpu.splitters import TwoStageSplitter as Mine

    kw = dict(first_divide_size=first, second_divide_size=second, seed=42,
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log),
             _cow_safe_two_stage(Ref)(**kw).split(grid_log),
             f"twostage {first}/{second}")


@pytest.mark.parametrize("seed", [2, 27])
def test_two_stage_shuffle(reference, grid_log, seed):
    from replay.splitters import TwoStageSplitter as Ref

    from replay_tpu.splitters import TwoStageSplitter as Mine

    kw = dict(first_divide_size=0.4, second_divide_size=3, shuffle=True,
              seed=seed, query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log),
             _cow_safe_two_stage(Ref)(**kw).split(grid_log),
             f"twostage shuffle {seed}")


@pytest.mark.parametrize("drop_users,drop_items",
                         [(True, False), (False, True)])
def test_two_stage_drop_cold(reference, grid_log, drop_users, drop_items):
    from replay.splitters import TwoStageSplitter as Ref

    from replay_tpu.splitters import TwoStageSplitter as Mine

    kw = dict(first_divide_size=0.5, second_divide_size=0.5, seed=8,
              drop_cold_users=drop_users, drop_cold_items=drop_items,
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log),
             _cow_safe_two_stage(Ref)(**kw).split(grid_log),
             f"twostage dropcold {drop_users}/{drop_items}")


# --- RatioSplitter edges ----------------------------------------------------

@pytest.mark.parametrize("test_size", [0.05, 0.95])
@pytest.mark.parametrize("split_by_fractions", [False, True])
def test_ratio_edges(reference, grid_log, test_size, split_by_fractions):
    from replay.splitters import RatioSplitter as Ref

    from replay_tpu.splitters import RatioSplitter as Mine

    kw = dict(test_size=test_size, divide_column="query_id",
              split_by_fractions=split_by_fractions,
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"ratio edge {test_size}/{split_by_fractions}")


# --- TimeSplitter edges -----------------------------------------------------

@pytest.mark.parametrize("threshold", [0.1, 0.9])
def test_time_edges(reference, grid_log, threshold):
    from replay.splitters import TimeSplitter as Ref

    from replay_tpu.splitters import TimeSplitter as Mine

    kw = dict(time_threshold=threshold, query_column="query_id",
              item_column="item_id", timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"time edge {threshold}")


@pytest.mark.parametrize("drop_users,drop_items",
                         [(True, False), (False, True)])
def test_time_drop_cold(reference, grid_log, drop_users, drop_items):
    from replay.splitters import TimeSplitter as Ref

    from replay_tpu.splitters import TimeSplitter as Mine

    kw = dict(time_threshold=0.6, drop_cold_users=drop_users,
              drop_cold_items=drop_items, query_column="query_id",
              item_column="item_id", timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"time dropcold {drop_users}/{drop_items}")


# --- LastNSplitter edges ----------------------------------------------------

@pytest.mark.parametrize("n", [1, 1000])
def test_last_n_edges(reference, grid_log, n):
    """N=1 (minimal) and N far above every group size (whole log → test)."""
    from replay.splitters import LastNSplitter as Ref

    from replay_tpu.splitters import LastNSplitter as Mine

    kw = dict(N=n, divide_column="query_id", strategy="interactions",
              query_column="query_id", item_column="item_id",
              timestamp_column="timestamp")
    _eq_pair(Mine(**kw).split(grid_log), Ref(**kw).split(grid_log),
             f"lastn edge {n}")
