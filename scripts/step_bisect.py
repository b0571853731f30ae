"""Step bisect of the headline train step (PERF.md profile tool).

Times the full train step at the bench.py config with 2/1/0 transformer
blocks and with a zero-cost loss, separating CE / per-block / embed+opt
slices.  Run from the repo root on a TPU host: `python scripts/step_bisect.py`.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time
import numpy as np

import bench as B
import jax, jax.numpy as jnp

def build(blocks, loss=None):
    from replay_tpu.data.nn.schema import (TensorFeatureInfo, TensorFeatureSource, TensorFeatureType, TensorSchema)
    from replay_tpu.data.schema import FeatureHint, FeatureSource
    from replay_tpu.nn.sequential.sasrec import SasRec
    from replay_tpu.nn.tiled_ce import CELossTiled
    from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
    from replay_tpu.nn.transforms import NextTokenTransform
    from replay_tpu.parallel import make_mesh
    schema = TensorSchema(TensorFeatureInfo(
        "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
        feature_hint=FeatureHint.ITEM_ID,
        feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
        cardinality=B.N_ITEMS, embedding_dim=B.DIM, padding_value=B.N_ITEMS))
    model = SasRec(schema=schema, max_sequence_length=B.SEQ_LEN, num_blocks=blocks, num_heads=B.HEADS)
    trainer = Trainer(model, loss if loss is not None else CELossTiled(tile=2048, impl="auto"),
                      optimizer=OptimizerFactory(1e-3), transform=NextTokenTransform(),
                      config=TrainerConfig(batch_size=B.BATCH, max_sequence_length=B.SEQ_LEN),
                      mesh=make_mesh())
    rng = np.random.default_rng(0)
    batch = {
        "item_id": rng.integers(0, B.N_ITEMS, (B.BATCH, B.SEQ_LEN + 1)).astype(np.int32),
        "padding_mask": np.ones((B.BATCH, B.SEQ_LEN + 1), dtype=np.int8),
        "batch_mask": np.ones(B.BATCH, dtype=np.int8),
        "query_id": np.arange(B.BATCH, dtype=np.int64),
        "seq_len": np.full(B.BATCH, B.SEQ_LEN + 1, dtype=np.int32),
    }
    trainer.init_state(batch)
    step = trainer._build_train_step()
    db = trainer._place_batch(batch)
    return trainer, step, db

def time_step(step, state, db, iters=20):
    key = jax.random.PRNGKey(0)
    for i in range(3):
        state, stats = step(state, db, jax.random.fold_in(key, i))
    float(stats["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = step(state, db, jax.random.fold_in(key, 100 + i))
    float(stats["loss"])
    return (time.perf_counter() - t0) / iters * 1e3

class ZeroLoss:
    """Consumes hidden states cheaply: bypasses CE entirely."""
    def init(self, *a, **k):
        return None
    def __call__(self, hidden, labels, mask, item_weights, *, key=None):
        return jnp.sum(hidden.astype(jnp.float32)) * 1e-9

if __name__ == "__main__":
  for blocks in (2, 1, 0):
    tr, step, db = build(blocks)
    print(f"blocks={blocks} full-CE step: {time_step(step, tr.state, db):.2f} ms", flush=True)
  tr, step, db = build(2, loss=ZeroLoss())
  print(f"blocks=2 zero-loss step: {time_step(step, tr.state, db):.2f} ms", flush=True)
