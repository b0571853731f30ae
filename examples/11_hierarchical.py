"""Hierarchical recommender (analog of reference
examples/14_hierarchical_recommender.ipynb): a tree of k-means user
clusters over query features with an independent recommender per leaf,
compared against the same model fit flat.

    python examples/11_hierarchical.py
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
    FeatureSource,
    FeatureType,
)
from replay_tpu.experimental.models import HierarchicalRecommender
from replay_tpu.metrics import NDCG, Experiment, HitRate
from replay_tpu.models import PopRec
from replay_tpu.splitters import RatioSplitter

N_SEGMENTS = 4
ITEMS_PER_SEGMENT = 25


def synthetic_log(n_users=240, seed=4):
    """User taste segments correlate with an observable query feature:
    popularity WITHIN a segment differs from global popularity, which is
    exactly the structure per-leaf PopRec exploits."""
    rng = np.random.default_rng(seed)
    rows, feats = [], []
    for u in range(n_users):
        seg = u % N_SEGMENTS
        feats.append((u, seg * 3.0 + rng.normal(0, 0.3), rng.normal()))
        seg_pop = np.linspace(2.0, 0.1, ITEMS_PER_SEGMENT)  # within-segment skew
        probs = seg_pop / seg_pop.sum()
        for t, i in enumerate(
            rng.choice(ITEMS_PER_SEGMENT, size=14, replace=False, p=probs)
        ):
            rows.append((u, int(seg * ITEMS_PER_SEGMENT + i), 1.0, t))
    log = pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])
    qf = pd.DataFrame(feats, columns=["user_id", "taste", "noise"])
    return log.drop_duplicates(["user_id", "item_id"]), qf


def main():
    log, qf = synthetic_log()
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP),
            FeatureInfo("taste", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
            FeatureInfo("noise", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
        ]
    )
    train, test = RatioSplitter(
        0.3, divide_column="user_id", query_column="user_id"
    ).split(log)
    train_ds = Dataset(schema, train, query_features=qf, check_consistency=False)

    flat = PopRec()
    flat.fit(train_ds)

    tree = HierarchicalRecommender(
        model_factory=PopRec, branching=2, depth=2, min_cluster_size=5, seed=0
    )
    tree.fit(train_ds)

    experiment = Experiment(
        [NDCG(10), HitRate(10)], test, query_column="user_id", item_column="item_id"
    )
    experiment.add_result("PopRec (flat)", flat.predict(train_ds, k=10))
    experiment.add_result("HierarchicalRecommender", tree.predict(train_ds, k=10))
    print(experiment.results.to_string())
    ndcg = experiment.results["NDCG@10"]
    print(
        f"\nper-leaf popularity lifts NDCG@10 "
        f"{ndcg['PopRec (flat)']:.3f} -> {ndcg['HierarchicalRecommender']:.3f}"
    )


if __name__ == "__main__":
    main()
