"""Catalog-sharded training must be numerically equivalent to replicated.

The row-sharded embedding path (replay_tpu/parallel/sharding.py) changes
only data placement — XLA inserts gathers/collectives — so losses and
params after N steps must match the fully-replicated run bit-for-bit (up
to float addition order).  This is the guard against the classic sharded
embedding-gradient bugs (duplicate ids in a batch, scatter-add to wrong
shard) called out in SURVEY.md §7.
"""

import pytest as _pytest

pytestmark = _pytest.mark.mesh

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
from replay_tpu.nn.losses import CELoss
from replay_tpu.nn.sequential.sasrec import SasRec
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.parallel import make_mesh

# catalog ≥ the sharding threshold so the (data=4, model=2) mesh actually
# row-shards the table (replay_tpu/parallel/sharding.py _SHARD_ROW_THRESHOLD)
N_ITEMS = 16384


def make_dataset():
    rng = np.random.default_rng(0)
    rows = []
    for u in range(32):
        # duplicate ids inside sequences on purpose (the hard case)
        items = rng.integers(0, 200, 12)
        items[::3] = items[0]
        for t, i in enumerate(items):
            rows.append((u, int(i), t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            embedding_dim=16,
            padding_value=N_ITEMS,
        )
    )
    return SequentialDataset.from_interactions(schema, log)


def run(mesh):
    ds = make_dataset()
    model = SasRec(schema=ds.schema, max_sequence_length=8, num_blocks=1, num_heads=2,
                   dropout_rate=0.0)
    trainer = Trainer(
        model,
        CELoss(),
        # SGD: adaptive optimizers amplify float-reorder noise into visible
        # param drift; with SGD the sharded/replicated runs must agree tightly
        optimizer=OptimizerFactory(1e-1, algorithm="sgd"),
        transform=__import__("replay_tpu.nn.transforms", fromlist=["NextTokenTransform"]).NextTokenTransform(),
        config=TrainerConfig(max_epochs=2, batch_size=8, max_sequence_length=8, seed=0),
        mesh=mesh,
    )
    history = trainer.fit(ds)
    table = trainer.state.params["body"]["embedder"]["emb_item_id"]["table"]["embedding"]
    return history, np.asarray(jax.device_get(table))


def test_sharded_matches_replicated():
    hist_repl, table_repl = run(make_mesh(data=8, model=1))
    hist_shard, table_shard = run(make_mesh(data=4, model=2))
    for a, b in zip(hist_repl, hist_shard):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-4)
    # tolerance at bf16-activation precision: re-fused gathers under the
    # sharded layout round differently (~1e-3 abs after 8 SGD steps);
    # structural bugs (wrong shard, double-counted duplicate-id grads)
    # produce O(1e-1) errors and still fail loudly
    np.testing.assert_allclose(table_repl, table_shard, atol=2e-3)
