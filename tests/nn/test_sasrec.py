"""SASRec model + Trainer integration tests (virtual 8-device CPU mesh)."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from replay_tpu.nn.losses import CELoss, CESampledLoss, LogInCELoss
from replay_tpu.nn.sequential.sasrec import SasRec
from replay_tpu.nn.training import (
    LRSchedulerFactory,
    OptimizerFactory,
    Trainer,
    TrainerConfig,
)
from replay_tpu.nn.transforms import NextTokenTransform
from replay_tpu.parallel import make_mesh

from tests.nn.conftest import N_ITEMS


def make_batch(bsz=4, length=8):
    rng = np.random.default_rng(0)
    return {
        "item_id": rng.integers(0, N_ITEMS, (bsz, length)).astype(np.int32),
        "padding_mask": np.ones((bsz, length), dtype=np.int8),
        "batch_mask": np.ones(bsz, dtype=np.int8),
        "query_id": np.arange(bsz, dtype=np.int64),
        "seq_len": np.full(bsz, length, dtype=np.int32),
    }


class TestSasRecModel:
    def test_forward_shapes(self, item_schema):
        model = SasRec(schema=item_schema, max_sequence_length=8, num_blocks=2, num_heads=2)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            deterministic=True,
        )
        hidden = model.apply(variables, batch, deterministic=True, method=SasRec.forward_train)
        assert hidden.shape == (4, 8, 16)
        logits = model.apply(variables, batch, method=SasRec.forward_inference)
        assert logits.shape == (4, N_ITEMS)
        assert logits.dtype == jnp.float32
        cands = jnp.asarray([0, 5, 7])
        sub = model.apply(variables, batch, cands, method=SasRec.forward_inference)
        assert sub.shape == (4, 3)
        np.testing.assert_allclose(sub, logits[:, cands], rtol=2e-2, atol=1e-3)

    def test_causality(self, item_schema):
        """Changing a future item must not change past positions' hidden states."""
        model = SasRec(schema=item_schema, max_sequence_length=8, num_blocks=2, num_heads=2)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            deterministic=True,
        )
        h1 = model.apply(variables, batch, deterministic=True, method=SasRec.forward_train)
        modified = dict(batch)
        modified["item_id"] = batch["item_id"].at[:, -1].set((batch["item_id"][:, -1] + 1) % N_ITEMS)
        h2 = model.apply(variables, modified, deterministic=True, method=SasRec.forward_train)
        np.testing.assert_allclose(
            np.asarray(h1[:, :-1], np.float32), np.asarray(h2[:, :-1], np.float32), atol=1e-5
        )
        assert not np.allclose(np.asarray(h1[:, -1], np.float32), np.asarray(h2[:, -1], np.float32))

    def test_padding_invariance(self, item_schema):
        """Content of padded positions must not affect valid outputs."""
        model = SasRec(schema=item_schema, max_sequence_length=8, num_blocks=1, num_heads=2)
        batch = make_batch()
        batch["padding_mask"][:, :3] = 0
        b1 = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            b1,
            deterministic=True,
        )
        h1 = model.apply(variables, b1, deterministic=True, method=SasRec.forward_train)
        batch2 = dict(batch)
        batch2["item_id"] = batch["item_id"].copy()
        batch2["item_id"][:, :3] = 0
        b2 = {k: jnp.asarray(v) for k, v in batch2.items()}
        h2 = model.apply(variables, b2, deterministic=True, method=SasRec.forward_train)
        np.testing.assert_allclose(
            np.asarray(h1[:, 3:], np.float32), np.asarray(h2[:, 3:], np.float32), atol=1e-5
        )


@pytest.mark.parametrize("loss", [CESampledLoss(16), CELoss(), LogInCELoss()],
                         ids=lambda l: type(l).__name__)
def test_training_reduces_loss(seq_dataset, loss):
    model = SasRec(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1, num_heads=2,
                   dropout_rate=0.0)
    trainer = Trainer(
        model,
        loss,
        optimizer=OptimizerFactory(learning_rate=5e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=5, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(seq_dataset)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_trainer_on_8_device_mesh(seq_dataset):
    mesh = make_mesh(data=8, model=1)
    model = SasRec(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1, num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=1, batch_size=16, max_sequence_length=8),
        mesh=mesh,
    )
    history = trainer.fit(seq_dataset)
    assert np.isfinite(history[0]["loss"])
    ids, items, scores = trainer.predict_topk(seq_dataset, k=5)
    assert items.shape == (len(seq_dataset), 5)
    # filter_seen: no recommended item may be in the user's history
    for qid, recs in zip(ids, items):
        seen = set(seq_dataset.get_sequence_by_query_id(qid, "item_id"))
        assert not (set(recs.tolist()) & seen)
    # scores sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_validation_metrics(seq_dataset):
    model = SasRec(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1, num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        transform=NextTokenTransform(),
        scheduler=LRSchedulerFactory(warmup_steps=2, decay="cosine", total_steps=50),
        config=TrainerConfig(max_epochs=1, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(seq_dataset, val_dataset=seq_dataset)
    rec = history[0]
    assert "ndcg@10" in rec and 0.0 <= rec["ndcg@10"] <= 1.0
    assert "recall@5" in rec


def test_from_params_reference_signature(item_schema):
    """embedding_dim / excluded_features kwargs (reference:
    replay/nn/sequential/sasrec/model.py:200)."""
    import jax as _jax
    import jax.numpy as _jnp

    from replay_tpu.nn.sequential import SasRec as _SasRec

    model = _SasRec.from_params(
        item_schema,
        embedding_dim=24,
        num_heads=2,
        num_blocks=1,
        max_sequence_length=8,
        excluded_features=[],
    )
    batch = {k: _jnp.asarray(v) for k, v in make_batch().items()}
    variables = model.init(
        {"params": _jax.random.PRNGKey(0), "dropout": _jax.random.PRNGKey(1)},
        batch,
    )
    hidden = model.apply(variables, batch, deterministic=True)
    assert hidden.shape[-1] == 24
