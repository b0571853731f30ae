"""Full model-comparison protocol (analog of reference
examples/02_models_comparison.ipynb): time split → hyperparameter search on
a validation split → fit/predict with timing → Experiment table over the
whole classical zoo + SasRec/TwoTower.

    python examples/04_models_comparison.py                    # small synthetic log
    python examples/04_models_comparison.py --synthetic-ml1m   # ML-1M statistics
    python examples/04_models_comparison.py --ratings ml-1m/ratings.dat

``--synthetic-ml1m`` runs the complete protocol at MovieLens-1M's published
scale and marginals (replay_tpu.data.synthetic: 6040 users × ~3880 movies,
~1M ratings, real demographics/genres from the reference's shipped
metadata files, published per-user/per-item/rating distributions) — the
strongest quality table this image permits (QUALITY.md).

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
from replay_tpu.metrics import MAP, MRR, NDCG, Coverage, Experiment, HitRate, Surprisal
from replay_tpu.models import (
    ALSWrap,
    ItemKNN,
    PopRec,
    RandomRec,
    SLIM,
    UCB,
    Wilson,
    Word2VecRec,
)
from replay_tpu.splitters import TimeSplitter

K = 10
K_LIST = [1, 5, 10]
BUDGET = 5
SEED = 42


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


def run_neural(train, test_queries, experiment, rows, epochs, seq_len, batch):
    """SasRec + TwoTower rows for the comparison table (reference notebook
    09/15 configs shrunk to the CPU budget; full CE over the catalog)."""
    from replay_tpu.data.nn import (
        SequenceTokenizer,
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.nn.losses import CELoss
    from replay_tpu.nn.sequential import SasRec, TwoTower
    from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
    from replay_tpu.nn.transforms import NextTokenTransform

    schema = FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    n_items = train["item_id"].nunique()
    tensor_schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=n_items,
            embedding_dim=64,
            padding_value=n_items,
        )
    )
    tokenizer = SequenceTokenizer(tensor_schema)
    train_seq = tokenizer.fit_transform(
        Dataset(schema, train[["query_id", "item_id", "timestamp"]], check_consistency=False)
    )
    inv_q = tokenizer.query_id_encoder.inverse_mapping["query_id"]
    inv_i = tokenizer.item_id_encoder.inverse_mapping["item_id"]
    inv_q_arr = np.array([inv_q[c] for c in range(len(inv_q))])
    inv_i_arr = np.array([inv_i[c] for c in range(len(inv_i))])
    test_set = set(test_queries)

    configs = [
        ("SasRec", SasRec(schema=tensor_schema, max_sequence_length=seq_len,
                          num_blocks=2, num_heads=2, dropout_rate=0.2)),
        ("TwoTower", TwoTower(schema=tensor_schema, max_sequence_length=seq_len,
                              num_blocks=2)),
    ]
    for name, model in configs:
        trainer = Trainer(
            model,
            CELoss(),
            optimizer=OptimizerFactory(3e-3),
            transform=NextTokenTransform(),
            config=TrainerConfig(
                max_epochs=epochs, batch_size=batch,
                max_sequence_length=seq_len, seed=7,
            ),
        )
        t0 = time.perf_counter()
        history = trainer.fit(train_seq)
        fit_t = time.perf_counter() - t0
        print(f"{name}: loss {history[0]['loss']:.3f} -> {history[-1]['loss']:.3f}")
        t0 = time.perf_counter()
        ids, items, scores = trainer.predict_topk(train_seq, k=10)
        pred_t = time.perf_counter() - t0
        k = items.shape[1]
        recs = pd.DataFrame(
            {
                "query_id": np.repeat(inv_q_arr[ids], k),
                "item_id": inv_i_arr[np.minimum(items, len(inv_i_arr) - 1)].ravel(),
                "rating": scores.ravel().astype(np.float64),
            }
        )
        recs = recs[recs["query_id"].isin(test_set)]
        experiment.add_result(name, recs)
        rows.append((name, fit_t, pred_t))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ratings", default=None,
                        help="path to MovieLens ratings (runs the real ML-1M protocol)")
    parser.add_argument("--synthetic-ml1m", action="store_true",
                        help="statistics-matched synthetic ML-1M (full scale)")
    parser.add_argument("--scale", type=float, default=1.0,
                        help="shrink factor for --synthetic-ml1m quick runs")
    parser.add_argument("--no-neural", action="store_true",
                        help="skip the SasRec/TwoTower rows")
    parser.add_argument("--epochs", type=int, default=5,
                        help="neural training epochs")
    args = parser.parse_args()
    if args.ratings:
        log = load_ratings(args.ratings)
    elif args.synthetic_ml1m:
        from replay_tpu.data.synthetic import synthetic_ml1m

        log, _, _ = synthetic_ml1m(scale=args.scale)
        print(f"synthetic ML-1M: {len(log)} interactions, "
              f"{log['query_id'].nunique()} users, {log['item_id'].nunique()} items")
    else:
        log = synthetic_ml()
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
    # --- the notebook-02 protocol, step for step -----------------------------
    # ratings >= 3 are positive feedback with rating := 1 (cell 17)
    positives = log[log["rating"] >= 3].copy()
    positives["rating"] = 1.0
    splitter = TimeSplitter(
        time_threshold=0.2, drop_cold_items=True, drop_cold_users=True,
        query_column="query_id",
    )
    train, test = splitter.split(positives)  # (cell 18)
    opt_train, opt_val = splitter.split(train)
    # negatives (< 3, rating := 0) before the test window join the
    # Wilson/UCB train (cell 22)
    test_start = test["timestamp"].min()
    negatives = log[(log["rating"] < 3) & (log["timestamp"] < test_start)].copy()
    negatives["rating"] = 0.0
    pos_neg_train = pd.concat([train, negatives], ignore_index=True)

    train_ds = Dataset(schema, train, check_consistency=False)
    train_neg_ds = Dataset(schema, pos_neg_train, check_consistency=False)
    opt_train_ds = Dataset(schema, opt_train, check_consistency=False)
    opt_val_ds = Dataset(schema, opt_val, check_consistency=False)
    test_queries = test["query_id"].unique()
    print(f"train: {len(train)} rows, test: {len(test)} rows, "
          f"{len(test_queries)} test users", flush=True)

    experiment = Experiment(
        [MAP(K), NDCG(K), HitRate(K_LIST), Coverage(K), Surprisal(K), MRR(K)],
        test,
        train,
    )

    # (name, model, uses_negatives, optimize: None=default space,
    #  dict=param_borders, "no_opt")  — notebook cells 32 & 38
    models = [
        ("Popular", PopRec(), False, "no_opt"),
        ("Random (uniform)", RandomRec(seed=SEED, distribution="uniform"), False, "no_opt"),
        ("Random (popularity-based)", RandomRec(seed=SEED, distribution="popular_based"),
         False, {"alpha": [-0.5, 100]}),
        ("UCB", UCB(exploration_coef=0.5), True, "no_opt"),
        ("Wilson", Wilson(), True, "no_opt"),
        ("Implicit ALS", ALSWrap(seed=SEED), False, None),
        ("Explicit ALS", ALSWrap(seed=SEED, implicit_prefs=False), False, None),
        ("ItemKNN", ItemKNN(), False, None),
        ("SLIM", SLIM(seed=SEED), False, None),
        ("Word2Vec", Word2VecRec(seed=SEED), False, None),
    ]
    rows = []
    for name, model, use_neg, opt in models:
        fit_ds = train_neg_ds if use_neg else train_ds
        if opt != "no_opt" and getattr(model, "_search_space", None):
            borders = opt if isinstance(opt, dict) else None
            best = model.optimize(
                opt_train_ds, opt_val_ds, param_borders=borders, budget=BUDGET
            )
            model.set_params(**best)
            print(f"{name}: tuned params {best}", flush=True)
        t0 = time.perf_counter()
        model.fit(fit_ds)
        fit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        recs = model.predict(fit_ds, k=K, queries=test_queries)
        pred_t = time.perf_counter() - t0
        experiment.add_result(name, recs)
        rows.append((name, fit_t, pred_t))
        print(f"{name}: fit {fit_t:.1f}s predict {pred_t:.1f}s", flush=True)

    if not args.no_neural and (args.synthetic_ml1m or args.ratings):
        neural_seq_len = 128 if args.scale >= 0.5 else 32
        neural_batch = 64
        run_neural(train, test_queries, experiment, rows,
                   epochs=args.epochs, seq_len=neural_seq_len, batch=neural_batch)

    table = experiment.results
    timing = pd.DataFrame(rows, columns=["model", "fit_time", "predict_time"]).set_index("model")
    print(table.join(timing).round(4).sort_values("NDCG@10", ascending=False).to_string())


if __name__ == "__main__":
    main()
