"""Hierarchical recommender (analog of reference
examples/14_hierarchical_recommender.ipynb): the HCB item-space cluster
tree of Song et al. (arXiv 2110.09905) — internal ULinUCB recommenders
route each user down to their taste cluster, the leaf ranks its items —
compared against a flat ULinUCB over the whole catalog.

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
from sklearn.cluster import KMeans

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.experimental.models import HierarchicalRecommender, ULinUCB
from replay_tpu.metrics import NDCG, Experiment, HitRate
from replay_tpu.splitters import RatioSplitter

N_SEGMENTS = 4
ITEMS_PER_SEGMENT = 25


def synthetic_log(n_users=240, seed=4):
    """Item features separate into taste segments; each user interacts
    inside one segment with a within-segment popularity skew — exactly the
    structure the item tree exploits: the root recommender only has to pick
    the right segment, the leaf only has to rank 25 items."""
    rng = np.random.default_rng(seed)
    rows, itf = [], []
    for i in range(N_SEGMENTS * ITEMS_PER_SEGMENT):
        seg = i // ITEMS_PER_SEGMENT
        itf.append((i, seg * 3.0 + rng.normal(0, 0.3), rng.normal()))
    for u in range(n_users):
        seg = u % N_SEGMENTS
        seg_pop = np.linspace(2.0, 0.1, ITEMS_PER_SEGMENT)  # within-segment skew
        probs = seg_pop / seg_pop.sum()
        for t, i in enumerate(
            rng.choice(ITEMS_PER_SEGMENT, size=14, replace=False, p=probs)
        ):
            rows.append((u, int(seg * ITEMS_PER_SEGMENT + i), 1.0, t))
    log = pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])
    item_features = pd.DataFrame(itf, columns=["item_id", "taste", "noise"])
    return log.drop_duplicates(["user_id", "item_id"]), item_features


def main():
    log, itf = synthetic_log()
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP),
            FeatureInfo("taste", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES),
            FeatureInfo("noise", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES),
        ]
    )
    train, test = RatioSplitter(
        0.3, divide_column="user_id", query_column="user_id"
    ).split(log)
    train_ds = Dataset(schema, train, item_features=itf, check_consistency=False)

    flat = ULinUCB()
    flat.fit(train_ds)

    tree = HierarchicalRecommender(
        depth=2,
        cluster_model=KMeans(n_clusters=N_SEGMENTS, n_init="auto", random_state=0),
        recommender_class=ULinUCB,
    )
    tree.fit(train_ds)

    experiment = Experiment(
        [NDCG(10), HitRate(10)], test, query_column="user_id", item_column="item_id"
    )
    experiment.add_result("ULinUCB (flat)", flat.predict(train_ds, k=10))
    experiment.add_result("HierarchicalRecommender", tree.predict(train_ds, k=10))
    print(experiment.results.to_string())
    ndcg = experiment.results["NDCG@10"]
    print(
        f"\nitem-tree routing NDCG@10 "
        f"{ndcg['ULinUCB (flat)']:.3f} -> {ndcg['HierarchicalRecommender']:.3f}"
    )


if __name__ == "__main__":
    main()
