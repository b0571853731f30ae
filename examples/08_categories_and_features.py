"""Category-scoped recommendations + history-based feature generation
(analog of reference examples/05_feature_generators.ipynb and
08_recommending_for_categories.ipynb): CatPopRec over a category tree, then
LogStat/ConditionalPopularity features for a second-level ranker.

    python examples/08_categories_and_features.py
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

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureType,
)
from replay_tpu.models import CatPopRec
from replay_tpu.preprocessing import HistoryBasedFeaturesProcessor


def synthetic_log(n_users=250, seed=5):
    """Items belong to leaf categories under a 2-level tree."""
    rng = np.random.default_rng(seed)
    leaves = ["rock", "jazz", "thriller", "romance"]
    parents = {"rock": "music", "jazz": "music", "thriller": "books", "romance": "books"}
    items = pd.DataFrame(
        {
            "item_id": np.arange(120),
            "category": [leaves[i % 4] for i in range(120)],
        }
    )
    base = pd.Timestamp("2024-03-01")
    rows = []
    for u in range(n_users):
        fav = leaves[u % 4]
        for t in range(15):
            cat = fav if rng.random() < 0.8 else leaves[int(rng.integers(0, 4))]
            pool = items[items["category"] == cat]["item_id"].to_numpy()
            rows.append(
                (
                    u,
                    int(rng.choice(pool)),
                    float(rng.integers(1, 6)),
                    base + pd.Timedelta(hours=int(rng.integers(0, 24 * 30))),
                )
            )
    log = pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])
    log = log.drop_duplicates(["user_id", "item_id"]).reset_index(drop=True)
    cat_tree = pd.DataFrame(
        {"category": leaves, "parent": [parents[c] for c in leaves]}
    )
    return log, items, cat_tree


def main():
    log, items, cat_tree = synthetic_log()
    log_with_cat = log.merge(items, on="item_id")

    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING),
        ]
    )

    # 1. most-popular-per-category over the flat leaf categories
    model = CatPopRec()
    model.fit(Dataset(schema, log_with_cat))
    recs = model.predict(["rock", "thriller"], k=3)
    print("Top-3 per leaf category:")
    print(recs.to_string(index=False))

    # 2. tree categories: a parent category aggregates its leaves
    tree_frame = pd.DataFrame(
        {
            "category": list(cat_tree["parent"].unique()) + list(cat_tree["category"]),
            "parent_cat": [None] * cat_tree["parent"].nunique() + list(cat_tree["parent"]),
        }
    )
    tree_model = CatPopRec(cat_tree=tree_frame)
    tree_model.fit(Dataset(schema, log_with_cat))
    tree_recs = tree_model.predict(["music", "books"], k=3)
    print("\nTop-3 per PARENT category (aggregated over leaves):")
    print(tree_recs.to_string(index=False))

    # 3. history-based features for a downstream ranker
    users = pd.DataFrame(
        {"user_id": np.arange(log["user_id"].nunique()), "age_group": "18-25"}
    )
    users.loc[users["user_id"] % 3 == 0, "age_group"] = "26-40"
    fp = HistoryBasedFeaturesProcessor(
        user_cat_features_list=["age_group"],
        query_column="user_id",
        item_column="item_id",
    )
    fp.fit(log, user_features=users, item_features=items[["item_id", "category"]])
    pairs = log[["user_id", "item_id"]].head(8)
    feats = fp.transform(pairs.merge(users, on="user_id").merge(items, on="item_id"))
    feature_cols = [c for c in feats.columns if c not in pairs.columns]
    print(f"\nGenerated {len(feature_cols)} history-based feature columns, e.g.:")
    print(feats[["user_id", "item_id", "u_log_num_interact", "i_mean", "abnormality"]]
          .head(5).to_string(index=False))


if __name__ == "__main__":
    main()
