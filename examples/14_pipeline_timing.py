"""Pipeline-stage timing protocol (analog of reference
examples/11_sasrec_dataframes_comparison.ipynb): time each stage of the
SasRec preparation pipeline — split, tokenizer fit, tokenizer transform,
dataloader pass, one train epoch — on a synthetic ML-1M-scale log.

The reference notebook compares pandas/polars/spark backends; replay_tpu
has ONE columnar plane, so this script reports its stage timings directly
(the numbers the reference's protocol was designed to compare).

    python examples/14_pipeline_timing.py [--rows 500000]
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
from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.sequence_tokenizer import SequenceTokenizer
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.nn.losses import CELoss
from replay_tpu.nn.sequential import SasRec
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform
from replay_tpu.parallel import make_mesh
from replay_tpu.splitters import TimeSplitter

N_ITEMS, SEQ_LEN, DIM = 3706, 50, 64


def synthetic_log(rows: int, n_users: int = 6040, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, rows),
            "item_id": (rng.zipf(1.3, rows) - 1) % N_ITEMS,
            "rating": 1.0,
            "timestamp": rng.integers(0, 1_000_000, rows),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return df.reset_index(drop=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=500_000)
    args = parser.parse_args()

    log = synthetic_log(args.rows)
    print(f"log: {len(log):,} interactions, {log.user_id.nunique():,} users")
    stage_times = {}

    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP),
        ]
    )

    t0 = time.perf_counter()
    train, _test = TimeSplitter(0.2, query_column="user_id").split(log)
    stage_times["split (TimeSplitter 0.2)"] = time.perf_counter() - t0

    tensor_schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            embedding_dim=DIM,
            padding_value=N_ITEMS,
        )
    )
    tokenizer = SequenceTokenizer(tensor_schema)
    train_ds = Dataset(schema, train)

    t0 = time.perf_counter()
    tokenizer.fit(train_ds)
    stage_times["tokenizer fit"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    seq = tokenizer.transform(train_ds)
    stage_times["tokenizer transform"] = time.perf_counter() - t0

    trainer = Trainer(
        SasRec(schema=tensor_schema, max_sequence_length=SEQ_LEN, num_blocks=2, num_heads=2),
        CELoss(),
        optimizer=OptimizerFactory(1e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=1, batch_size=512, max_sequence_length=SEQ_LEN),
        mesh=make_mesh(),
    )

    n_batches = (len(seq) + 511) // 512

    t0 = time.perf_counter()
    history = trainer.fit(seq)
    stage_times["1 train epoch (incl. compile)"] = time.perf_counter() - t0

    print(f"\n{'stage':40s} seconds")
    for name, secs in stage_times.items():
        print(f"{name:40s} {secs:8.2f}")
    print(f"\nfinal epoch loss: {history[-1]['loss']:.3f}  ({n_batches} batches)")


if __name__ == "__main__":
    main()
