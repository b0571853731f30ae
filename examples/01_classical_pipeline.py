"""End-to-end classical pipeline (analog of reference examples/01-02):
raw log → filters → encoding → split → fit several models → compare.

Runs on CPU or TPU; uses a synthetic MovieLens-shaped log so it is fully
self-contained (no downloads).

    python examples/01_classical_pipeline.py
"""

import os
import sys
from pathlib import Path

# examples default to CPU for fast startup; set REPLAY_TPU_DEVICE=tpu to
# run on the accelerator (first compiles take longer there)
_device = os.environ.get("REPLAY_TPU_DEVICE", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _device)
import jax  # noqa: E402

jax.config.update("jax_platforms", _device)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.dataset_utils import DatasetLabelEncoder
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.metrics import MAP, NDCG, Coverage, Experiment, HitRate
from replay_tpu.models import ALSWrap, ItemKNN, PopRec, SLIM
from replay_tpu.preprocessing import MinCountFilter
from replay_tpu.splitters import RatioSplitter


def synthetic_log(n_users=500, n_items=400, seed=7) -> pd.DataFrame:
    """Low-rank preference structure + popularity skew."""
    rng = np.random.default_rng(seed)
    user_f = rng.normal(size=(n_users, 8))
    item_f = rng.normal(size=(n_items, 8))
    rows = []
    for u in range(n_users):
        scores = user_f[u] @ item_f.T + rng.gumbel(size=n_items)
        liked = np.argsort(-scores)[: rng.integers(10, 40)]
        for t, i in enumerate(liked):
            rows.append((f"u{u}", f"i{i}", 1.0, t))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])


def main():
    log = synthetic_log()
    log = MinCountFilter(5, "user_id").transform(log)

    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    encoder = DatasetLabelEncoder()
    dataset = encoder.fit_transform(Dataset(schema, log))

    train, test = RatioSplitter(
        test_size=0.25, divide_column=schema.query_id_column, query_column=schema.query_id_column
    ).split(dataset.interactions)
    train_ds = Dataset(schema, train, check_consistency=False)

    experiment = Experiment(
        [NDCG(10), MAP(10), HitRate(10), Coverage(10)],
        test,
        train,
        query_column="user_id",
        item_column="item_id",
        rating_column="rating",
    )
    for model in [PopRec(), ItemKNN(num_neighbours=50), ALSWrap(rank=32, seed=0), SLIM()]:
        model.fit(train_ds)
        recs = model.predict(train_ds, k=10, queries=test["user_id"].unique())
        experiment.add_result(str(model), recs)
    print(experiment.results.round(4).to_string())


if __name__ == "__main__":
    main()
