"""TiSasRec tests."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.data.schema import FeatureHint, FeatureSource
from replay_tpu.nn.losses import CESampledLoss
from replay_tpu.nn.sequential import TiSasRec
from replay_tpu.nn.sequential.tisasrec import relative_intervals
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform

N_ITEMS = 30


def make_schema():
    return TensorSchema(
        [
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                cardinality=N_ITEMS,
                embedding_dim=16,
                padding_value=N_ITEMS,
            ),
            TensorFeatureInfo(
                "timestamp",
                TensorFeatureType.NUMERICAL,
                is_seq=True,
                feature_hint=FeatureHint.TIMESTAMP,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "timestamp")],
            ),
        ]
    )


def test_relative_intervals_clip():
    ts = jnp.asarray([[0, 10, 300]])
    out = relative_intervals(ts, time_span=100)
    np.testing.assert_array_equal(out[0], [[0, 10, 100], [10, 0, 100], [100, 100, 0]])


def test_forward_and_time_sensitivity():
    schema = make_schema()
    model = TiSasRec(schema=schema, max_sequence_length=8, num_blocks=1, num_heads=2,
                     time_span=64, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    batch = {
        "item_id": rng.integers(0, N_ITEMS, (2, 8)).astype(np.int32),
        "timestamp": np.arange(8, dtype=np.float32)[None].repeat(2, 0) * 10,
        "padding_mask": np.ones((2, 8), np.int8),
    }
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, b,
        deterministic=True,
    )
    h1 = model.apply(variables, b, deterministic=True, method=TiSasRec.forward_train)
    assert h1.shape == (2, 8, 16)
    # changing ONLY the time gaps must change the output (time-awareness)
    b2 = dict(b)
    b2["timestamp"] = b["timestamp"] * 5
    h2 = model.apply(variables, b2, deterministic=True, method=TiSasRec.forward_train)
    assert not np.allclose(np.asarray(h1, np.float32), np.asarray(h2, np.float32))
    logits = model.apply(variables, b, method=TiSasRec.forward_inference)
    assert logits.shape == (2, N_ITEMS)


def test_training_reduces_loss():
    schema = make_schema()
    rng = np.random.default_rng(0)
    rows = []
    for u in range(24):
        start = rng.integers(0, N_ITEMS)
        for t in range(10):
            rows.append((u, int((start + t) % N_ITEMS), float(t * 60)))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    ds = SequentialDataset.from_interactions(schema, log)
    model = TiSasRec(schema=schema, max_sequence_length=8, num_blocks=1, num_heads=2,
                     time_span=32, dropout_rate=0.0)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        optimizer=OptimizerFactory(5e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=5, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(ds)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
