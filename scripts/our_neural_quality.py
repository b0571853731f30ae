"""replay_tpu neural rows for the synthetic-ML-1M quality table — the
exact counterpart of scripts/ref_torch_quality.py (same protocol split,
same scoring Experiment, matched config: d=64, L=128, 2 blocks, 2 heads,
dropout 0.2, lr 3e-3, batch 64, full-catalog CE, filter-seen top-10).

    python scripts/our_neural_quality.py --model twotower --seed 7
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np
import pandas as pd

from ref_torch_quality import EMBED, K, LR, SEQ_LEN, BATCH, protocol_split  # noqa: E402


def train_ours(train: pd.DataFrame, epochs: int, model_name: str, seed: int):
    from replay_tpu.data import Dataset
    from replay_tpu.data.nn import (
        SequenceTokenizer,
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
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
            embedding_dim=EMBED,
            padding_value=n_items,
        )
    )
    tokenizer = SequenceTokenizer(tensor_schema)
    train_seq = tokenizer.fit_transform(
        Dataset(schema, train[["query_id", "item_id", "timestamp"]], check_consistency=False)
    )
    # the reference-torch composition this differential trains against
    # (what twotower_from_torch reproduces): kang-variant query blocks
    # (query-only LN, residual from the normalized query —
    # transformer.py:95-108), torch eps 1e-8, and an FFN of width D — the
    # reference's PointWiseFeedForward is Conv1d(D, D, 1) twice
    # (ffn.py:32-35), NOT the 4·D default our preln stack uses
    arch = dict(num_blocks=2, num_heads=2, dropout_rate=0.2,
                variant="kang", layer_norm_eps=1e-8, hidden_dim=EMBED)
    if model_name == "twotower":
        model = TwoTower(schema=tensor_schema, max_sequence_length=SEQ_LEN, **arch)
    else:
        model = SasRec(schema=tensor_schema, max_sequence_length=SEQ_LEN, **arch)
    trainer = Trainer(
        model,
        CELoss(),
        optimizer=OptimizerFactory(LR),
        transform=NextTokenTransform(),
        config=TrainerConfig(
            max_epochs=epochs, batch_size=BATCH,
            max_sequence_length=SEQ_LEN, seed=seed,
        ),
    )
    t0 = time.perf_counter()
    history = trainer.fit(train_seq)
    fit_s = time.perf_counter() - t0
    print(f"[ours] loss {history[0]['loss']:.3f} -> {history[-1]['loss']:.3f}",
          flush=True)

    inv_q = tokenizer.query_id_encoder.inverse_mapping["query_id"]
    inv_i = tokenizer.item_id_encoder.inverse_mapping["item_id"]
    inv_q_arr = np.array([inv_q[c] for c in range(len(inv_q))])
    inv_i_arr = np.array([inv_i[c] for c in range(len(inv_i))])
    ids, items, scores = trainer.predict_topk(train_seq, k=K)
    recs = pd.DataFrame(
        {
            "query_id": np.repeat(inv_q_arr[ids], items.shape[1]),
            "item_id": inv_i_arr[np.minimum(items, len(inv_i_arr) - 1)].ravel(),
            "rating": scores.ravel().astype(np.float64),
        }
    )
    return recs, fit_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--model", choices=["sasrec", "twotower"], default="sasrec")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from replay_tpu.metrics import MAP, MRR, NDCG, Coverage, Experiment, HitRate, Surprisal

    train, test = protocol_split(args.scale)
    test_queries = set(test["query_id"].unique())
    print(f"train {len(train)} rows, {len(test_queries)} test users", flush=True)
    recs, fit_s = train_ours(train, args.epochs, args.model, args.seed)
    recs = recs[recs["query_id"].isin(test_queries)]
    experiment = Experiment(
        [MAP(K), NDCG(K), HitRate([1, 5, 10]), Coverage(K), Surprisal(K), MRR(K)],
        test, train,
    )
    label = {"sasrec": "SasRec", "twotower": "TwoTower"}[args.model] + " (replay_tpu)"
    experiment.add_result(label, recs)
    table = experiment.results.round(4)
    print(table.to_string(), flush=True)
    result = {
        "model": label, "scale": args.scale, "epochs": args.epochs,
        "seed": args.seed, "fit_seconds": round(fit_s, 1),
        **{c: float(table.iloc[0][c]) for c in table.columns},
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result) + "\n")


if __name__ == "__main__":
    sys.exit(main())
