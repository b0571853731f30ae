"""TwoTower tests, including item-feature buffers."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.nn.losses import LogInCELoss
from replay_tpu.nn.sequential.twotower import TwoTower
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform

from tests.nn.conftest import N_ITEMS
from tests.nn.test_sasrec import make_batch


def test_forward_and_item_tower(item_schema):
    model = TwoTower(schema=item_schema, max_sequence_length=8, num_blocks=1, num_heads=2)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        deterministic=True,
    )
    hidden = model.apply(variables, batch, deterministic=True, method=TwoTower.forward_train)
    assert hidden.shape == (4, 8, 16)
    logits = model.apply(variables, batch, method=TwoTower.forward_inference)
    assert logits.shape == (4, N_ITEMS)
    weights = model.apply(variables, method=lambda m: m.body.get_item_weights(None))
    assert weights.shape == (N_ITEMS, 16)


def test_item_features_stored_as_constants(item_schema):
    item_feat_schema = TensorSchema(
        [
            TensorFeatureInfo("category", TensorFeatureType.CATEGORICAL, cardinality=5,
                              embedding_dim=16),
            TensorFeatureInfo("price", TensorFeatureType.NUMERICAL),
        ]
    )
    rng = np.random.default_rng(0)
    features = {
        "category": rng.integers(0, 5, N_ITEMS).astype(np.int32),
        "price": rng.random(N_ITEMS).astype(np.float32),
    }
    model = TwoTower(schema=item_schema, max_sequence_length=8, item_schema=item_feat_schema)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        deterministic=True,
        item_features=features,
    )
    assert "constants" in variables
    consts = variables["constants"]["body"]["item_tower"]
    np.testing.assert_array_equal(np.asarray(consts["category"]), features["category"])
    weights = model.apply(variables, method=lambda m: m.body.get_item_weights(None))
    assert weights.shape == (N_ITEMS, 16)
    assert bool(jnp.all(jnp.isfinite(weights)))


def test_twotower_training_with_inbatch_loss(seq_dataset):
    model = TwoTower(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1,
                     dropout_rate=0.0)
    trainer = Trainer(
        model,
        LogInCELoss(temperature=0.5),
        optimizer=OptimizerFactory(5e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=5, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(seq_dataset)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_features_reader_parquet_roundtrip(tmp_path, item_schema):
    """FeaturesReader loads an item-feature parquet into the dict the
    ItemTower consumes (reference reader.py:18 semantics: schema-validated
    columns, dense rows by item id, list features padded)."""
    import pandas as pd

    from replay_tpu.data.nn.schema import TensorFeatureSource
    from replay_tpu.data.schema import FeatureHint, FeatureSource
    from replay_tpu.nn.sequential.twotower import FeaturesReader

    rng = np.random.default_rng(0)
    n = N_ITEMS
    df = pd.DataFrame(
        {
            "item_id": np.arange(n),
            "category": rng.integers(0, 5, n).astype(np.int64),
            "tags": [list(rng.integers(0, 7, rng.integers(1, 4))) for _ in range(n)],
        }
    )
    path = tmp_path / "items.parquet"
    df.to_parquet(path)
    reader_schema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id", TensorFeatureType.CATEGORICAL, cardinality=n,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            ),
            TensorFeatureInfo(
                "category", TensorFeatureType.CATEGORICAL, cardinality=5,
                embedding_dim=16,
                feature_sources=[TensorFeatureSource(FeatureSource.ITEM_FEATURES, "category")],
            ),
            TensorFeatureInfo(
                "tags", TensorFeatureType.CATEGORICAL_LIST, cardinality=7,
                embedding_dim=16,
                feature_sources=[TensorFeatureSource(FeatureSource.ITEM_FEATURES, "tags")],
            ),
        ]
    )
    reader = FeaturesReader(
        reader_schema, metadata={"tags": {"shape": 3, "padding_value": -1}},
        path=str(path),
    )
    assert set(reader.feature_names) == {"category", "tags"}
    np.testing.assert_array_equal(reader["category"], df["category"].to_numpy())
    assert reader["tags"].shape == (n, 3)
    # padded positions hold the pad value, real prefixes match
    row0 = df["tags"].iloc[0]
    np.testing.assert_array_equal(reader["tags"][0, : len(row0)], row0)
    assert (reader["tags"][0, len(row0):] == -1).all()
    # unknown metadata key → ValueError
    import pytest

    with pytest.raises(ValueError):
        FeaturesReader(reader_schema, metadata={"nope": {}}, path=str(path))


def test_from_params_factory(item_schema):
    """Reference-signature factory (reference: twotower/model.py:536)."""
    model = TwoTower.from_params(
        item_schema, num_heads=2, num_blocks=1, max_sequence_length=8
    )
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )
    hidden = model.apply(variables, batch, deterministic=True)
    assert hidden.shape[0] == batch["item_id"].shape[0]
