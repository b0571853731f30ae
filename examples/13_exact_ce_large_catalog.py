"""Exact full-softmax CE at catalog sizes where dense logits cannot exist.

The reference's answer to large catalogs is approximation — sampled CE or
the bucketed SCE loss (reference: replay/models/nn/loss/sce.py).  Here the
tiled/flash CE (`CELossTiled`) trains with the EXACT softmax over the whole
catalog at O(M·tile) memory: on TPU the Pallas flash kernels keep logit
tiles in VMEM; on CPU the XLA scan path runs the same math.

    python examples/13_exact_ce_large_catalog.py          # CPU, scaled down
    REPLAY_TPU_DEVICE=tpu python examples/13_exact_ce_large_catalog.py

On a v5e chip this trains a 1M-item catalog (dense CE would need a ~100 GB
logits buffer per batch); the CPU demo uses 30k items to stay quick.
"""

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

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.schema import FeatureHint, FeatureSource
from replay_tpu.nn.losses import CESampledLoss
from replay_tpu.nn.sequential.sasrec import SasRec
from replay_tpu.nn.tiled_ce import CELossTiled
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform

ON_TPU = jax.default_backend() == "tpu"
N_ITEMS = 1_000_000 if ON_TPU else 30_000
SEQ_LEN = 16
BATCH = 512 if ON_TPU else 64
STEPS = 30 if ON_TPU else 15
DIM = 64


def make_batches(rng, n_batches):
    """Synthetic sessions with structure: each user walks a popularity-
    ordered neighborhood, so next-item is learnable."""
    for _ in range(n_batches):
        start = rng.integers(0, N_ITEMS - SEQ_LEN - 2, BATCH)
        walk = np.cumsum(rng.integers(0, 2, (BATCH, SEQ_LEN + 1)), axis=1)
        ids = (start[:, None] + walk).astype(np.int32) % N_ITEMS
        yield {
            "item_id": ids,
            "padding_mask": np.ones((BATCH, SEQ_LEN + 1), np.int8),
            "batch_mask": np.ones(BATCH, np.int8),
            "query_id": np.arange(BATCH, dtype=np.int64),
            "seq_len": np.full(BATCH, SEQ_LEN + 1, np.int32),
        }


def run(loss, label):
    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, embedding_dim=DIM, padding_value=N_ITEMS,
        )
    )
    model = SasRec(schema=schema, max_sequence_length=SEQ_LEN, num_blocks=1,
                   num_heads=2, dropout_rate=0.0)
    trainer = Trainer(
        model, loss, optimizer=OptimizerFactory(3e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(batch_size=BATCH, max_sequence_length=SEQ_LEN),
    )
    rng = np.random.default_rng(0)
    batches = list(make_batches(rng, STEPS))
    trainer.init_state(batches[0])
    step = trainer._build_train_step()
    state = trainer.state
    key = jax.random.PRNGKey(0)
    losses = []
    t0 = time.perf_counter()
    for i, batch in enumerate(batches):
        state, stats = step(state, trainer._place_batch(batch),
                            jax.random.fold_in(key, i))
        losses.append(float(stats["loss"]))
    took = time.perf_counter() - t0
    print(f"{label:>28}: loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"({STEPS} steps, {took:.1f}s, catalog {N_ITEMS:,})")
    return losses


def main():
    print(f"backend: {jax.default_backend()}")
    exact = run(CELossTiled(tile=8192, compute_dtype="bfloat16"), "exact CE (tiled/flash)")
    sampled = run(CESampledLoss(256), "sampled CE (256 negatives)")
    assert exact[-1] < exact[0], "exact CE must learn"
    assert sampled[-1] < sampled[0], "sampled CE must learn"
    print("exact CE trains where dense logits would need "
          f"{BATCH * SEQ_LEN * N_ITEMS * 4 / 1e9:.1f} GB per batch "
          f"({512 * 50 * 1_000_000 * 4 / 1e9:.0f} GB at the TPU config)")


if __name__ == "__main__":
    main()
