"""Chip pins for all three flagship families: train-step throughput AND
serving latency, one reproduce command each (round-4 verdict item 7).

    python scripts/bench_serving.py                    # all models, both modes
    python scripts/bench_serving.py --models twotower  # one family
    python scripts/bench_serving.py --mode serve

Train config matches bench.py's headline protocol (ML-1M-scale catalog
N=3706, d=64, L=50, 2 blocks, batch 8192, exact full-softmax CE via
CELossTiled) so the three families' numbers are directly comparable;
serving is the jitted ``forward_inference`` + full-catalog top-10 path
(filter-seen off — the mask scatter is query-set-dependent host work).

Timing forces a device→host transfer per measured region: under the axon
remote-TPU tunnel, ``block_until_ready`` returns at ENQUEUE (CLAUDE.md
gotcha), so unforced loops over-report by up to 60×.

reference analogs: examples/09 (SasRec), examples/15 (TwoTower),
examples/10 (Bert4Rec) serving/training protocol.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ITEMS = 3706
SEQ_LEN = 50
DIM = 64
BLOCKS = 2
HEADS = 2
TRAIN_BATCH = 8192  # headline protocol batch (round-5 sweet spot)
K = 10


def make_schema():
    from replay_tpu.data.nn.schema import (
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource

    return TensorSchema(
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


def make_model_and_transform(name: str, schema):
    from replay_tpu.nn.sequential import Bert4Rec, SasRec, TwoTower
    from replay_tpu.nn.sequential.bert4rec import mask_token_id
    from replay_tpu.nn.transforms import MaskedLMTransform, NextTokenTransform

    if name == "sasrec":
        return (
            SasRec(schema=schema, max_sequence_length=SEQ_LEN,
                   num_blocks=BLOCKS, num_heads=HEADS),
            NextTokenTransform(),
        )
    if name == "twotower":
        return (
            TwoTower(schema=schema, max_sequence_length=SEQ_LEN,
                     num_blocks=BLOCKS),
            NextTokenTransform(),
        )
    if name == "bert4rec":
        return (
            Bert4Rec(schema=schema, max_sequence_length=SEQ_LEN,
                     num_blocks=BLOCKS, num_heads=HEADS),
            MaskedLMTransform(mask_prob=0.2, mask_token=mask_token_id(schema)),
        )
    raise ValueError(name)


def make_trainer(name: str):
    from replay_tpu.nn.tiled_ce import CELossTiled
    from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
    from replay_tpu.parallel import make_mesh

    schema = make_schema()
    model, transform = make_model_and_transform(name, schema)
    trainer = Trainer(
        model,
        CELossTiled(tile=2048, impl="auto"),
        optimizer=OptimizerFactory(1e-3),
        transform=transform,
        config=TrainerConfig(batch_size=TRAIN_BATCH, max_sequence_length=SEQ_LEN),
        mesh=make_mesh(),
    )
    return trainer


def fake_batch(batch_size: int, seq_len: int):
    rng = np.random.default_rng(0)
    return {
        "item_id": rng.integers(0, N_ITEMS, (batch_size, seq_len)).astype(np.int32),
        "padding_mask": np.ones((batch_size, seq_len), dtype=np.int8),
        "batch_mask": np.ones(batch_size, dtype=np.int8),
        "query_id": np.arange(batch_size, dtype=np.int64),
        "seq_len": np.full(batch_size, seq_len, dtype=np.int32),
    }


def bench_train(name: str) -> dict:
    import jax

    trainer = make_trainer(name)
    batch = fake_batch(TRAIN_BATCH, SEQ_LEN + 1)
    trainer.init_state(batch)
    step = trainer._build_train_step()
    device_batch = trainer._place_batch(batch)
    key = jax.random.PRNGKey(0)
    state = trainer.state
    for i in range(3):
        state, stats = step(state, device_batch, jax.random.fold_in(key, i))
    float(stats["loss"])  # force: wait for real completion
    n_steps = 20
    start = time.perf_counter()
    for i in range(n_steps):
        state, stats = step(state, device_batch, jax.random.fold_in(key, 100 + i))
    float(stats["loss"])
    dt = time.perf_counter() - start
    return {
        "model": name, "mode": "train", "batch": TRAIN_BATCH,
        "examples_per_s": round(TRAIN_BATCH * n_steps / dt, 1),
        "ms_per_step": round(dt / n_steps * 1e3, 2),
    }


def bench_serve(name: str, batch_size: int) -> dict:
    import jax
    import jax.numpy as jnp

    trainer = make_trainer(name)
    init_b = fake_batch(batch_size, SEQ_LEN + 1)
    trainer.init_state(init_b)
    trainer._build_train_step()  # sets the batch sharding _place_batch uses
    model = trainer.model
    extra = trainer.extra_variables

    @jax.jit
    def serve(params, batch):
        logits = model.apply(
            {"params": params, **extra}, batch,
            method=type(model).forward_inference,
        )
        return jax.lax.top_k(logits, K)

    batch = trainer._place_batch(fake_batch(batch_size, SEQ_LEN))
    params = trainer.state.params
    for _ in range(3):
        vals, idx = serve(params, batch)
    np.asarray(vals[0, 0])  # force
    # one force at the END: the device stream is FIFO, so the last batch's
    # result completing implies all 30 executed; per-iteration forcing would
    # measure the ~37 ms tunnel RTT, not device latency (PERF.md round-3
    # serving methodology)
    iters = 30
    start = time.perf_counter()
    for _ in range(iters):
        vals, idx = serve(params, batch)
    np.asarray(vals[0, 0])
    dt = (time.perf_counter() - start) / iters
    return {
        "model": name, "mode": "serve", "batch": batch_size, "k": K,
        "ms_per_batch": round(dt * 1e3, 2),
        "queries_per_s": round(batch_size / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="sasrec,twotower,bert4rec")
    ap.add_argument("--mode", choices=["train", "serve", "both"], default="both")
    ap.add_argument("--serve-batches", default="256,4096")
    args = ap.parse_args()
    results = []
    for name in args.models.split(","):
        if args.mode in ("train", "both"):
            r = bench_train(name)
            results.append(r)
            print(json.dumps(r), flush=True)
        if args.mode in ("serve", "both"):
            for b in (int(x) for x in args.serve_batches.split(",")):
                r = bench_serve(name, b)
                results.append(r)
                print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
