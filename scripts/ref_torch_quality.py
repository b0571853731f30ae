"""Reference-torch SasRec rows for the synthetic-ML-1M quality table.

Trains the REFERENCE's own torch SasRec (`/root/reference`) through the
reference's own notebook-09 pipeline — its LabelEncoder, groupby_sequences,
ParquetModule with make_default_sasrec_transforms, `replay.nn.sequential.
SasRec.from_params` (CE loss), `replay.nn.lightning.OptimizerFactory` — on
the EXACT train/test split `examples/04_models_comparison.py
--synthetic-ml1m` produces, and scores it with the same replay_tpu
Experiment.  The only part of the reference not executed is the
lightning.Trainer driver loop (lightning is not installed in this image);
the epoch loop below calls the reference LightningModule's forward and
configure_optimizers directly, which is all Trainer.fit does per step.

Usage:
    python scripts/ref_torch_quality.py --scale 0.1 --epochs 2   # smoke
    python scripts/ref_torch_quality.py                          # full table row

reference: replay/nn/sequential/sasrec/model.py:116,
examples/09_sasrec_example.ipynb protocol, replay/nn/lightning/module.py:13.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("OMP_NUM_THREADS", "4")
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests" / "parity"))

import numpy as np
import pandas as pd

from conftest import _install_lightning_stub, _install_polars_stub  # noqa: E402

_install_polars_stub()
_install_lightning_stub()
sys.path.insert(0, "/root/reference")

SEED = 42
K = 10
SEQ_LEN = 128
BATCH = 64
LR = 3e-3
EMBED = 64


def protocol_split(scale: float):
    """The examples/04 notebook-02 protocol: binarize >=3, TimeSplitter 0.2
    with both drop-colds.  Must stay in lockstep with examples/04."""
    from replay_tpu.data.synthetic import synthetic_ml1m
    from replay_tpu.splitters import TimeSplitter

    log, _, _ = synthetic_ml1m(scale=scale)
    positives = log[log["rating"] >= 3].copy()
    positives["rating"] = 1.0
    splitter = TimeSplitter(
        time_threshold=0.2, drop_cold_items=True, drop_cold_users=True,
        query_column="query_id",
    )
    train, test = splitter.split(positives)
    return train, test


def train_reference_sasrec(train: pd.DataFrame, epochs: int, workdir: Path,
                           seq_len: int = SEQ_LEN, model_name: str = "sasrec",
                           seed: int = SEED):
    """Notebook-09 pipeline on the protocol train split (``model_name``
    picks SasRec or TwoTower — notebook-15 uses the same data plumbing).
    Returns (recs_for_all_train_users, fit_seconds)."""
    import torch

    torch.manual_seed(seed)
    torch.set_num_threads(int(os.environ.get("OMP_NUM_THREADS", "4")))

    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn import ParquetModule, TensorFeatureInfo, TensorSchema
    from replay.data.nn.schema import TensorFeatureSource
    from replay.data.nn.utils import groupby_sequences
    from replay.nn.lightning import LightningModule
    from replay.nn.lightning.optimizer import OptimizerFactory
    from replay.nn.sequential import SasRec
    from replay.nn.transform.template import make_default_sasrec_transforms
    from replay.preprocessing import LabelEncoder, LabelEncodingRule

    # -- reference preprocessing: encode, order by time, bake sequences -----
    events = train[["query_id", "item_id", "timestamp"]].copy()
    events["timestamp"] = events["timestamp"].astype("int64")
    events = events.sort_values(by="timestamp", kind="stable")
    events["timestamp"] = events.groupby("query_id").cumcount()

    encoder = LabelEncoder([LabelEncodingRule("query_id"), LabelEncodingRule("item_id")])
    encoded = encoder.fit_transform(events)
    n_items = len(encoder.mapping["item_id"])

    train_seqs = groupby_sequences(events=encoded, groupby_col="query_id", sort_col="timestamp")
    train_path = workdir / "train.parquet"
    predict_path = workdir / "predict.parquet"
    train_seqs.to_parquet(train_path)
    train_seqs.to_parquet(predict_path)  # predict over every user's history

    tensor_schema = TensorSchema(
        [
            TensorFeatureInfo(
                name="item_id",
                is_seq=True,
                padding_value=n_items,
                cardinality=n_items,
                embedding_dim=EMBED,
                feature_type=FeatureType.CATEGORICAL,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            )
        ]
    )
    transforms = make_default_sasrec_transforms(tensor_schema)
    metadata = {
        "train": {
            "item_id": {"shape": seq_len + 1, "padding": tensor_schema["item_id"].padding_value},
        },
        "predict": {
            "query_id": {},
            "item_id": {"shape": seq_len, "padding": tensor_schema["item_id"].padding_value},
        },
    }
    dm = ParquetModule(
        train_path=str(train_path),
        predict_path=str(predict_path),
        batch_size=BATCH,
        metadata=metadata,
        transforms=transforms,
    )

    if model_name == "twotower":
        from replay.nn.sequential.twotower import FeaturesReader, TwoTower

        catalog_path = workdir / "item_catalog.parquet"
        pd.DataFrame({"item_id": np.arange(n_items)}).to_parquet(catalog_path)
        reader = FeaturesReader(
            schema=tensor_schema, metadata={"item_id": {}}, path=str(catalog_path)
        )
        net = TwoTower.from_params(
            tensor_schema, reader,
            embedding_dim=EMBED, max_sequence_length=seq_len,
            num_heads=2, num_blocks=2, dropout=0.2,
        )
    else:
        net = SasRec.from_params(
            schema=tensor_schema,
            embedding_dim=EMBED,
            max_sequence_length=seq_len,
            num_heads=2,
            num_blocks=2,
            dropout=0.2,
        )
    lm = LightningModule(net, optimizer_factory=OptimizerFactory(learning_rate=LR))
    opt = lm.configure_optimizers()

    # -- the Trainer.fit inner loop, driven directly ------------------------
    t0 = time.perf_counter()
    lm.train()
    dm.setup("fit")  # sets up every split with a datapath (train + predict)
    for epoch in range(epochs):
        total, steps = 0.0, 0
        for batch in dm.train_dataloader():
            # what lightning's on_after_batch_transfer does per train batch
            batch = dm.compiled_transforms["train"](batch)
            out = lm(batch)
            loss = out["loss"]
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += float(loss.detach())
            steps += 1
        print(f"[ref-torch] epoch {epoch}: mean loss {total / max(steps, 1):.4f} "
              f"({steps} steps)", flush=True)
    fit_s = time.perf_counter() - t0

    # -- predict: last-position logits over the full catalog ----------------
    import torch as _t

    lm.eval()
    inv_q = encoder.inverse_mapping["query_id"]
    inv_i = encoder.inverse_mapping["item_id"]
    inv_q_arr = np.array([inv_q[c] for c in range(len(inv_q))])
    inv_i_arr = np.array([inv_i[c] for c in range(len(inv_i))])

    seen = encoded.groupby("query_id")["item_id"].agg(set).to_dict()
    rows_q, rows_i, rows_s = [], [], []
    with _t.no_grad():
        for batch in dm.predict_dataloader():
            batch = dm.compiled_transforms["predict"](batch)
            out = lm(batch)
            logits = out["logits"][:, :n_items]
            qids = batch["query_id"].numpy().ravel()
            # filter seen items (matches predict_topk's default on our side)
            for row, q in enumerate(qids):
                s = list(seen.get(int(q), ()))
                if s:
                    logits[row, s] = -_t.inf
            scores, items = _t.topk(logits, k=K, dim=1)
            rows_q.append(np.repeat(inv_q_arr[qids], K))
            rows_i.append(inv_i_arr[items.numpy().ravel()])
            rows_s.append(scores.numpy().ravel().astype(np.float64))
    recs = pd.DataFrame(
        {
            "query_id": np.concatenate(rows_q),
            "item_id": np.concatenate(rows_i),
            "rating": np.concatenate(rows_s),
        }
    )
    return recs, fit_s


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--model", choices=["sasrec", "twotower"], default="sasrec")
    parser.add_argument("--seed", type=int, default=SEED, help="torch init/shuffle seed")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--out", default=None, help="write a JSON result line here")
    args = parser.parse_args()

    from replay_tpu.metrics import MAP, MRR, NDCG, Coverage, Experiment, HitRate, Surprisal

    train, test = protocol_split(args.scale)
    test_queries = set(test["query_id"].unique())
    print(f"train {len(train)} rows, test {len(test)} rows, "
          f"{len(test_queries)} test users", flush=True)

    with tempfile.TemporaryDirectory() as td:
        recs, fit_s = train_reference_sasrec(
            train, args.epochs, Path(td), model_name=args.model, seed=args.seed
        )
    recs = recs[recs["query_id"].isin(test_queries)]

    experiment = Experiment(
        [MAP(K), NDCG(K), HitRate([1, 5, 10]), Coverage(K), Surprisal(K), MRR(K)],
        test,
        train,
    )
    label = {"sasrec": "SasRec", "twotower": "TwoTower"}[args.model] + " (reference torch)"
    experiment.add_result(label, recs)
    table = experiment.results.round(4)
    print(table.to_string(), flush=True)
    result = {
        "model": label,
        "scale": args.scale,
        "epochs": args.epochs,
        "seed": args.seed,
        "fit_seconds": round(fit_s, 1),
        **{c: float(table.iloc[0][c]) for c in table.columns},
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
