"""Bert4Rec tests."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.nn.losses import CESampledLoss
from replay_tpu.nn.sequential.bert4rec import Bert4Rec, mask_token_id
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import MaskedLMTransform

from tests.nn.conftest import N_ITEMS
from tests.nn.test_sasrec import make_batch


def test_forward_shapes(item_schema):
    model = Bert4Rec(schema=item_schema, max_sequence_length=8, num_blocks=1, num_heads=2)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        deterministic=True,
    )
    hidden = model.apply(variables, batch, deterministic=True, method=Bert4Rec.forward_train)
    assert hidden.shape == (4, 8, 16)
    logits = model.apply(variables, batch, method=Bert4Rec.forward_inference)
    assert logits.shape == (4, N_ITEMS)


def test_bidirectional_attention(item_schema):
    """Unlike SasRec, early positions DO see future items."""
    model = Bert4Rec(schema=item_schema, max_sequence_length=8, num_blocks=1, num_heads=2)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        deterministic=True,
    )
    h1 = model.apply(variables, batch, deterministic=True, method=Bert4Rec.forward_train)
    modified = dict(batch)
    modified["item_id"] = batch["item_id"].at[:, -1].set((batch["item_id"][:, -1] + 1) % N_ITEMS)
    h2 = model.apply(variables, modified, deterministic=True, method=Bert4Rec.forward_train)
    assert not np.allclose(np.asarray(h1[:, 0], np.float32), np.asarray(h2[:, 0], np.float32))


def test_masked_training_reduces_loss(seq_dataset):
    model = Bert4Rec(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1,
                     num_heads=2, dropout_rate=0.0)
    trainer = Trainer(
        model,
        CESampledLoss(16),
        optimizer=OptimizerFactory(5e-3),
        transform=MaskedLMTransform(mask_prob=0.3, mask_token=mask_token_id(seq_dataset.schema)),
        config=TrainerConfig(max_epochs=5, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(seq_dataset)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    ids, items, scores = trainer.predict_topk(seq_dataset, k=5)
    assert items.shape == (len(seq_dataset), 5)
    # mask token itself must never be recommended (logits only span catalog)
    assert items.max() < N_ITEMS
