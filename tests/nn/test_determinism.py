"""Bit-reproducibility: same seed → identical runs (SURVEY §7 multi-host
determinism requirement, achieved via counter-based RNG)."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import numpy as np

from replay_tpu.nn.losses import CESampledLoss, ScalableCELoss
from replay_tpu.nn.sequential.sasrec import SasRec
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform


def run_once(seq_dataset, seed=5):
    model = SasRec(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1,
                   num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        optimizer=OptimizerFactory(3e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=2, batch_size=8, max_sequence_length=8, seed=seed),
    )
    history = trainer.fit(seq_dataset)
    return [h["loss"] for h in history]


def test_same_seed_bitwise_reproducible(seq_dataset):
    a = run_once(seq_dataset, seed=5)
    b = run_once(seq_dataset, seed=5)
    assert a == b  # exact float equality

    c = run_once(seq_dataset, seed=6)
    assert a != c  # different seed → different stream


def test_sce_learns(seq_dataset):
    """SCE (bucketed approximate CE) must actually reduce loss in training,
    not just stay finite."""
    model = SasRec(schema=seq_dataset.schema, max_sequence_length=8, num_blocks=1,
                   num_heads=2, dropout_rate=0.0)
    trainer = Trainer(
        model,
        ScalableCELoss(n_buckets=8, bucket_size_x=16, bucket_size_y=16),
        optimizer=OptimizerFactory(5e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=6, batch_size=8, max_sequence_length=8),
    )
    history = trainer.fit(seq_dataset)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_steps_per_dispatch_matches_one_step_path(seq_dataset):
    """K scanned steps per dispatch reproduce the one-step path BITWISE
    (same fold_in(root, step) key stream), including an odd epoch tail that
    falls back to the one-step jit."""
    import jax

    def run(k_disp):
        model = SasRec(schema=seq_dataset.schema, max_sequence_length=8,
                       num_blocks=1, num_heads=2)
        trainer = Trainer(
            model,
            CESampledLoss(8),
            optimizer=OptimizerFactory(3e-3),
            transform=NextTokenTransform(),
            config=TrainerConfig(max_epochs=2, batch_size=8,
                                 max_sequence_length=8, seed=5,
                                 steps_per_dispatch=k_disp),
        )
        history = trainer.fit(seq_dataset)
        return [h["loss"] for h in history], trainer.state.params

    losses1, params1 = run(1)
    losses2, params2 = run(2)
    assert losses1 == losses2
    flat1 = jax.tree_util.tree_leaves(params1)
    flat2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(flat1, flat2):
        # the RNG streams are identical by construction (losses match
        # exactly); k_disp=1 and k_disp=2 are however DIFFERENT XLA
        # programs, and fusion may reassociate one reduction a few ulps
        # (observed: a single LayerNorm-scale element off by 6e-8).
        # Same-program bitwise reproducibility is asserted above in
        # test_same_seed_bitwise_reproducible.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-7)


def test_train_step_compiles_exactly_once(seq_dataset):
    """The state's scalar counters (flax step, optax count) must enter the
    jitted step COMMITTED with mesh shardings — otherwise the second
    dispatch sees a different input signature and silently recompiles the
    whole train step (measured 10-40 s per fit on the remote-TPU
    toolchain)."""
    import jax

    model = SasRec(schema=seq_dataset.schema, max_sequence_length=8,
                   num_blocks=1, num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(8),
        optimizer=OptimizerFactory(3e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=1, batch_size=8, max_sequence_length=8),
    )
    batch = next(iter(seq_dataset.batches(batch_size=8, max_sequence_length=8)))
    trainer.init_state(batch)
    step = trainer._build_train_step()
    db = trainer._place_batch(batch)
    key = jax.random.PRNGKey(0)
    state = trainer.state
    for i in range(3):
        state, _ = step(state, db, jax.random.fold_in(key, i))
    assert step._cache_size() == 1
