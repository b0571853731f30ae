"""Feature-rich sequential models: item + categorical + numerical features
through the multi-feature embedder (reference SequenceEmbedding coverage)."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from replay_tpu.data.nn import (
    SequentialDataset,
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.schema import FeatureHint, FeatureSource
from replay_tpu.nn.losses import CESampledLoss
from replay_tpu.nn.sequential import SasRec
from replay_tpu.nn.training import Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform

N_ITEMS = 30


def rich_schema():
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
                "category",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "category")],
                cardinality=5,
                embedding_dim=16,
                padding_value=5,
            ),
            TensorFeatureInfo(
                "rating",
                TensorFeatureType.NUMERICAL,
                is_seq=True,
                feature_hint=FeatureHint.RATING,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "rating")],
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


def rich_dataset():
    rng = np.random.default_rng(0)
    rows = []
    for u in range(24):
        for t in range(rng.integers(4, 12)):
            item = int(rng.integers(0, N_ITEMS))
            rows.append((u, item, item % 5, float(rng.integers(1, 6)), t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "category", "rating", "timestamp"])
    return SequentialDataset.from_interactions(rich_schema(), log)


def test_multifeature_forward_uses_all_features():
    ds = rich_dataset()
    model = SasRec(schema=ds.schema, max_sequence_length=8, num_blocks=1, num_heads=2,
                   dropout_rate=0.0)
    batch = {k: jnp.asarray(v) for k, v in ds.pad_batch(np.arange(4), 8).items()}
    batch["batch_mask"] = jnp.ones(4, dtype=jnp.int8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    h1 = model.apply(variables, batch, deterministic=True, method=SasRec.forward_train)
    # changing the category at the last position changes the output
    mod = dict(batch)
    mod["category"] = batch["category"].at[:, -1].set((batch["category"][:, -1] + 1) % 5)
    h2 = model.apply(variables, mod, deterministic=True, method=SasRec.forward_train)
    assert not np.allclose(np.asarray(h1, np.float32), np.asarray(h2, np.float32))
    # changing the rating also changes the output (numerical path)
    mod2 = dict(batch)
    mod2["rating"] = batch["rating"] + 1.0
    h3 = model.apply(variables, mod2, deterministic=True, method=SasRec.forward_train)
    assert not np.allclose(np.asarray(h1, np.float32), np.asarray(h3, np.float32))
    # timestamp is auto-excluded by from_params-style setup: changing it
    # must NOT change the output
    mod3 = dict(batch)
    mod3["timestamp"] = batch["timestamp"] * 7
    h4 = model.apply(variables, mod3, deterministic=True, method=SasRec.forward_train)
    np.testing.assert_allclose(
        np.asarray(h1, np.float32), np.asarray(h4, np.float32), atol=1e-6
    )


def test_multifeature_training_runs():
    ds = rich_dataset()
    model = SasRec.from_params(ds.schema, num_heads=2, num_blocks=1, max_sequence_length=8)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=2, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(ds)
    assert all(np.isfinite(h["loss"]) for h in history)


def test_categorical_list_feature():
    from replay_tpu.nn.embedding import SequenceEmbedding

    schema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                cardinality=N_ITEMS, embedding_dim=8, padding_value=N_ITEMS,
            ),
            TensorFeatureInfo(
                "genres", TensorFeatureType.CATEGORICAL_LIST, is_seq=True,
                cardinality=6, embedding_dim=8, padding_value=6,
            ),
        ]
    )
    batch = {
        "item_id": jnp.asarray(np.random.default_rng(0).integers(0, N_ITEMS, (2, 4)).astype(np.int32)),
        "genres": jnp.asarray([[[0, 1, 6], [2, 6, 6], [3, 4, 5], [6, 6, 6]]] * 2, dtype=jnp.int32),
    }
    for agg in ("sum", "mean", "max"):
        emb = SequenceEmbedding(schema=schema, list_aggregation=agg)
        variables = emb.init(jax.random.PRNGKey(0), batch)
        out = emb.apply(variables, batch)
        assert out.shape == (2, 4, 8)
        assert bool(jnp.all(jnp.isfinite(out)))
    # all-padding slots position: list part contributes zero under sum
    emb = SequenceEmbedding(schema=schema, list_aggregation="sum")
    variables = emb.init(jax.random.PRNGKey(0), batch)
    out = emb.apply(variables, batch)
    item_only = SequenceEmbedding(
        schema=schema.subset(["item_id"]))
    vars2 = {"params": {"emb_item_id": variables["params"]["emb_item_id"]}}
    out2 = item_only.apply(vars2, {"item_id": batch["item_id"]})
    np.testing.assert_allclose(
        np.asarray(out[:, 3], np.float32), np.asarray(out2[:, 3], np.float32), atol=1e-6
    )


def test_predict_candidates():
    ds = rich_dataset()
    model = SasRec.from_params(ds.schema, num_heads=2, num_blocks=1, max_sequence_length=8)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=1, batch_size=8, max_sequence_length=8),
    )
    trainer.fit(ds)
    cands = np.array([0, 5, 7, 9])
    ids, scores = trainer.predict_candidates(ds, cands)
    assert scores.shape == (len(ds), 4)
    # candidate scores equal the matching full-catalog columns
    _, items, _ = trainer.predict_topk(ds, k=N_ITEMS, filter_seen=False)
    full = trainer._make_infer_fn()(trainer.state.params,
                                    trainer._place_batch(next(ds.batches(8, 8))))
    np.testing.assert_allclose(
        scores[:8], np.asarray(full)[:, cands], rtol=2e-2, atol=1e-3
    )
