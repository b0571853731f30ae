"""Item-to-item recommendations (analog of reference examples/06):
similar-items lookup from fitted models, with exact and ANN-backed search.

    python examples/06_item2item.py
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
from replay_tpu.models import ALSWrap, AssociationRulesItemRec, ItemKNN


def synthetic_log(n_users=400, n_groups=8, group_size=30, seed=11):
    """Users stick to one item group; similar items share a group."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        g = u % n_groups
        for _ in range(25):
            if rng.random() < 0.85:
                item = g * group_size + int(rng.integers(0, group_size))
            else:
                item = int(rng.integers(0, n_groups * group_size))
            rows.append((u, item, 1.0))
    return (
        pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])
        .drop_duplicates(["user_id", "item_id"])
        .reset_index(drop=True)
    )


def in_group_rate(neigh: pd.DataFrame, group_size: int) -> float:
    same = (
        neigh["item_id"] // group_size == neigh["neighbour_item_idx"] // group_size
    )
    return float(same.mean())


def main():
    group_size = 30
    log = synthetic_log(group_size=group_size)
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING),
        ]
    )
    dataset = Dataset(schema, log)
    query_items = log["item_id"].unique()[:20]

    # 1. neighbourhood model: similarities ARE the model
    knn = ItemKNN(num_neighbours=10)
    knn.fit(dataset)
    knn_neigh = knn.get_nearest_items(query_items, k=5)
    print("ItemKNN nearest items (head):")
    print(knn_neigh.head(5).to_string(index=False))
    print(f"  in-group rate: {in_group_rate(knn_neigh, group_size):.2f}\n")

    # 2. association rules: confidence/lift ranked neighbours
    rules = AssociationRulesItemRec(min_item_count=3, min_pair_count=3)
    rules.fit(dataset)
    rule_neigh = rules.get_nearest_items(query_items, k=5, metric="lift")
    print("AssociationRules nearest by lift (head):")
    print(rule_neigh.head(5).to_string(index=False))
    print(f"  in-group rate: {in_group_rate(rule_neigh, group_size):.2f}\n")

    # 3. latent-factor model: cosine over learned item vectors
    als = ALSWrap(rank=16, seed=0, num_iterations=8)
    als.fit(dataset)
    als_neigh = als.get_nearest_items(query_items, k=5, metric="cosine_similarity")
    print("ALS nearest by cosine (head):")
    print(als_neigh.head(5).to_string(index=False))
    print(f"  in-group rate: {in_group_rate(als_neigh, group_size):.2f}\n")

    # 4. the same ALS item space served through the native HNSW index
    try:
        from replay_tpu.ann import HnswIndex

        vectors = als._get_item_vectors().astype(np.float32)
        index = HnswIndex(dim=vectors.shape[1], space="cosine")
        index.add_items(vectors)
        ids, _ = index.knn_query(vectors[:20], k=6)  # first hit = the item itself
        ann_rate = float(
            np.mean(ids[:, 1:] // group_size == (np.arange(20) // group_size)[:, None])
        )
        print(f"HNSW-served ALS neighbours in-group rate: {ann_rate:.2f}")
    except Exception as err:  # noqa: BLE001 - ANN extension is optional
        print(f"(native ANN unavailable: {err})")


if __name__ == "__main__":
    main()
