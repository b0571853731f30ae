"""Tour of all splitting strategies and interaction filters (analog of
reference examples/04_splitters.ipynb and 07_filters.ipynb): one log, every
splitter's train/test shape, every filter's surviving-row count.

    python examples/07_splitters_filters_tour.py
"""

import os
import sys
from pathlib import Path

_device = os.environ.get("REPLAY_TPU_DEVICE", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _device)
import jax  # noqa: E402

jax.config.update("jax_platforms", _device)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

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
)
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


def synthetic_log(n_users=300, n_items=200, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in range(n_users):
        n = int(rng.integers(5, 40))
        items = rng.choice(n_items, size=n, replace=False)
        for t, i in enumerate(items):
            rows.append(
                (u, int(i), float(rng.integers(1, 6)), base + pd.Timedelta(hours=u + 7 * t))
            )
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])


def main():
    log = synthetic_log()
    print(f"log: {len(log)} rows, {log.user_id.nunique()} users, {log.item_id.nunique()} items\n")

    splitters = [
        ("RatioSplitter(0.2, per user)", RatioSplitter(0.2, divide_column="user_id",
                                                       query_column="user_id")),
        ("TimeSplitter(0.2)", TimeSplitter(0.2, query_column="user_id")),
        ("LastNSplitter(N=2)", LastNSplitter(2, divide_column="user_id",
                                             query_column="user_id")),
        ("RandomSplitter(0.25)", RandomSplitter(0.25, seed=0)),
        ("ColdUserRandomSplitter(0.2)", ColdUserRandomSplitter(0.2, seed=0,
                                                               query_column="user_id")),
        ("NewUsersSplitter(0.2)", NewUsersSplitter(0.2, query_column="user_id")),
        ("RandomNextNSplitter(N=3)", RandomNextNSplitter(3, seed=0, divide_column="user_id",
                                                         query_column="user_id")),
        ("TwoStageSplitter(0.3 users, 2 items)",
         TwoStageSplitter(second_divide_size=2, first_divide_size=0.3, seed=0,
                          first_divide_column="user_id", query_column="user_id")),
    ]
    print(f"{'splitter':42s} {'train':>7s} {'test':>7s}")
    for name, splitter in splitters:
        train, test = splitter.split(log)
        print(f"{name:42s} {len(train):7d} {len(test):7d}")

    print("\nKFolds(n_folds=3):")
    for fold, (train, test) in enumerate(KFolds(n_folds=3, seed=0,
                                                query_column="user_id").split(log)):
        print(f"  fold {fold}: train {len(train)}, test {len(test)}")

    filters = [
        ("MinCountFilter(10 per user)", MinCountFilter(10, "user_id")),
        ("LowRatingFilter(>=4)", LowRatingFilter(4.0)),
        ("NumInteractionsFilter(first 5 per user)",
         NumInteractionsFilter(5, first=True, query_column="user_id")),
        ("EntityDaysFilter(3 days per user)",
         EntityDaysFilter(3, first=True, entity_column="user_id")),
        ("GlobalDaysFilter(first 7 days)", GlobalDaysFilter(7, first=True)),
        ("TimePeriodFilter(Jan 2024)",
         TimePeriodFilter("2024-01-01 00:00:00", "2024-02-01 00:00:00")),
        ("QuantileItemsFilter(q=0.95)", QuantileItemsFilter(alpha_quantile=0.95, query_column="user_id")),
        ("InteractionEntriesFilter(user 5..30)",
         InteractionEntriesFilter(min_inter_per_user=5, max_inter_per_user=30, query_column="user_id")),
        ("ConsecutiveDuplicatesFilter", ConsecutiveDuplicatesFilter(query_column="user_id")),
    ]
    print(f"\n{'filter':42s} {'rows kept':>9s}")
    for name, filt in filters:
        kept = filt.transform(log)
        print(f"{name:42s} {len(kept):9d}")


if __name__ == "__main__":
    main()
