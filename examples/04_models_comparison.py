"""Full model-comparison protocol (analog of reference
examples/02_models_comparison.ipynb): time split → hyperparameter search on
a validation split → fit/predict with timing → Experiment table over the
whole classical zoo.

    python examples/04_models_comparison.py                    # synthetic log
    python examples/04_models_comparison.py --ratings ml-1m/ratings.dat

With ``--ratings`` the REAL MovieLens-1M protocol runs (the quality-parity
run QUALITY.md is waiting on; the file is not vendorable in the zero-egress
build environment). Accepts the classic ``::``-separated ratings.dat or any
csv/parquet with user/item/rating/timestamp columns.
"""

import argparse
import os
import sys
import time
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
from replay_tpu.metrics import MAP, MRR, NDCG, Coverage, Experiment, HitRate
from replay_tpu.models import (
    ALSWrap,
    ItemKNN,
    PopRec,
    RandomRec,
    SLIM,
    ThompsonSampling,
    UCB,
    Wilson,
    Word2VecRec,
)
from replay_tpu.splitters import TimeSplitter


def synthetic_ml(n_users=800, n_items=600, seed=11) -> pd.DataFrame:
    """Low-rank preferences + popularity skew + binary-ish ratings."""
    rng = np.random.default_rng(seed)
    uf = rng.normal(size=(n_users, 12))
    vf = rng.normal(size=(n_items, 12))
    pop_bias = rng.gumbel(0, 1.2, n_items)
    rows = []
    for u in range(n_users):
        scores = uf[u] @ vf.T + pop_bias + rng.gumbel(size=n_items)
        liked = np.argsort(-scores)[: rng.integers(15, 60)]
        base_t = rng.integers(0, 500)
        for j, i in enumerate(liked):
            rating = float(rng.integers(1, 6))
            rows.append((u, int(i), rating, base_t + j))
    return pd.DataFrame(rows, columns=["query_id", "item_id", "rating", "timestamp"])


def load_ratings(path: str) -> pd.DataFrame:
    """MovieLens ratings.dat (``user::item::rating::timestamp``) or any
    csv/parquet with the four standard columns."""
    cols = ["query_id", "item_id", "rating", "timestamp"]
    if path.endswith(".parquet"):
        frame = pd.read_parquet(path)
    elif path.endswith(".dat"):
        frame = pd.read_csv(path, sep="::", engine="python", names=cols)
    else:
        frame = pd.read_csv(path)
    rename = {"user_id": "query_id", "userId": "query_id", "movieId": "item_id"}
    frame = frame.rename(columns=rename)
    return frame[cols]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ratings", default=None,
                        help="path to MovieLens ratings (runs the real ML-1M protocol)")
    args = parser.parse_args()
    log = load_ratings(args.ratings) if args.ratings else synthetic_ml()
    schema = FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
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
    splitter = TimeSplitter(time_threshold=0.2, query_column="query_id")
    train, test = splitter.split(log)
    opt_train, opt_val = splitter.split(train)
    train_ds = Dataset(schema, train, check_consistency=False)
    opt_train_ds = Dataset(schema, opt_train, check_consistency=False)
    opt_val_ds = Dataset(schema, opt_val, check_consistency=False)
    test_queries = test["query_id"].unique()

    experiment = Experiment(
        [NDCG(10), MAP(10), MRR(10), HitRate(10), Coverage(10)],
        test,
        train,
    )

    # bandit models need binary rewards (reference notebook binarizes >=3)
    binary = train.copy()
    binary["rating"] = (binary["rating"] >= 3).astype(float)
    binary_ds = Dataset(schema, binary, check_consistency=False)

    models = [
        ("PopRec", PopRec(), False),
        ("ItemKNN", ItemKNN(), True),
        ("ALS", ALSWrap(rank=32, seed=7), False),
        ("SLIM", SLIM(), False),
        ("Word2Vec", Word2VecRec(rank=32, window_size=3, max_iter=5, seed=7), False),
        ("Wilson", Wilson(), "binary"),
        ("ThompsonSampling", ThompsonSampling(seed=7), "binary"),
        ("UCB", UCB(), "binary"),
        ("RandomRec(popularity)", RandomRec(distribution="popular_based", seed=7), False),
        ("RandomRec(uniform)", RandomRec(seed=7), False),
    ]
    rows = []
    for name, model, mode in models:
        fit_ds = binary_ds if mode == "binary" else train_ds
        if mode is True and model._search_space:
            best = model.optimize(opt_train_ds, opt_val_ds, budget=5)
            model.set_params(**best)
            print(f"{name}: tuned params {best}")
        t0 = time.perf_counter()
        model.fit(fit_ds)
        fit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        recs = model.predict(fit_ds, k=10, queries=test_queries)
        pred_t = time.perf_counter() - t0
        experiment.add_result(name, recs)
        rows.append((name, fit_t, pred_t))

    table = experiment.results
    timing = pd.DataFrame(rows, columns=["model", "fit_time", "predict_time"]).set_index("model")
    print(table.join(timing).round(4).sort_values("NDCG@10", ascending=False).to_string())


if __name__ == "__main__":
    main()
