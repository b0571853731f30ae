"""Training-quality parity vs the reference's own torch SasRec.

The ML-1M notebook-09 comparison is blocked on data (QUALITY.md); this is
the executable stand-in: the reference's pure-torch ``SasRecModel``
(replay/models/nn/sequential/sasrec/model.py:15 — no lightning needed) and
replay_tpu's flax SasRec train on the SAME synthetic successor-pattern log
with matched capacity, and both are scored with replay_tpu's HitRate@10 on
held-out next items.  The TPU model must match or beat the reference run.
"""

import numpy as np
import pandas as pd
import pytest

N_ITEMS = 60
SEQ_LEN = 12
DIM = 32


def _make_sequences(n_users=120, seed=0):
    """Cyclic successor walks with 15% noise: next item = (cur + 1) % N."""
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n_users):
        cur = int(rng.integers(0, N_ITEMS))
        seq = [cur]
        for _ in range(SEQ_LEN):
            cur = (cur + 1) % N_ITEMS if rng.random() > 0.15 else int(rng.integers(0, N_ITEMS))
            seq.append(cur)
        seqs.append(seq)
    return seqs


def _hitrate_at10(ranked_items, targets):
    hits = [t in ranked[:10] for ranked, t in zip(ranked_items, targets)]
    return float(np.mean(hits))


@pytest.fixture(scope="module")
def split_sequences():
    seqs = _make_sequences()
    train = [s[:-1] for s in seqs]
    targets = [s[-1] for s in seqs]
    return train, targets


def _train_reference_torch(reference, train, targets):
    import torch
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn.schema import TensorFeatureInfo, TensorFeatureSource, TensorSchema

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            FeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            padding_value=N_ITEMS,
            embedding_dim=DIM,
        )
    )
    from replay.models.nn.sequential.sasrec.model import SasRecModel

    torch.manual_seed(0)
    model = SasRecModel(
        schema=schema, num_blocks=1, num_heads=2, hidden_size=DIM, max_len=SEQ_LEN
    )
    ids = torch.tensor(train, dtype=torch.long)  # [U, SEQ_LEN]
    pad_mask = torch.ones_like(ids, dtype=torch.bool)
    u = ids.shape[0]
    # left-pad the shifted inputs back to max_len (positional table is fixed)
    pad_col = torch.full((u, 1), N_ITEMS, dtype=torch.long)
    inputs = torch.cat([pad_col, ids[:, :-1]], dim=1)
    labels = torch.cat([torch.full((u, 1), -100, dtype=torch.long), ids[:, 1:]], dim=1)
    in_mask = torch.cat([torch.zeros(u, 1, dtype=torch.bool), pad_mask[:, :-1]], dim=1)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    ce = torch.nn.CrossEntropyLoss(ignore_index=-100)
    model.train()
    for _ in range(60):
        opt.zero_grad()
        logits = model({"item_id": inputs}, in_mask)  # [U, L-1, N]
        loss = ce(logits.reshape(-1, logits.shape[-1])[:, :N_ITEMS], labels.reshape(-1))
        loss.backward()
        opt.step()
    model.eval()
    with torch.no_grad():
        scores = model.predict({"item_id": ids}, pad_mask)[:, :N_ITEMS]
    ranked = torch.argsort(scores, dim=1, descending=True).numpy()
    return _hitrate_at10(ranked, targets)


def _train_ours(train, targets):
    import jax

    from replay_tpu.data.nn import (
        SequentialDataset,
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource
    from replay_tpu.nn.losses import CELoss
    from replay_tpu.nn.sequential import SasRec
    from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
    from replay_tpu.nn.transforms import NextTokenTransform

    schema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[
                    TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")
                ],
                cardinality=N_ITEMS,
                embedding_dim=DIM,
                padding_value=N_ITEMS,
            )
        ]
    )
    rows = [
        (u, item, t) for u, seq in enumerate(train) for t, item in enumerate(seq)
    ]
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    ds = SequentialDataset.from_interactions(schema, log)
    model = SasRec(
        schema=schema, max_sequence_length=SEQ_LEN - 1, num_blocks=1, num_heads=2
    )
    trainer = Trainer(
        model,
        CELoss(),
        optimizer=OptimizerFactory(1e-2),
        transform=NextTokenTransform(),
        config=TrainerConfig(
            max_epochs=60, batch_size=128, max_sequence_length=SEQ_LEN - 1, seed=0
        ),
    )
    trainer.fit(ds)
    qids, items, _ = trainer.predict_topk(ds, k=10, filter_seen=False)
    order = np.argsort(qids)
    return _hitrate_at10(items[order], targets)


def test_sasrec_matches_reference_training_quality(reference, split_sequences):
    train, targets = split_sequences
    ref_hit = _train_reference_torch(reference, train, targets)
    our_hit = _train_ours(train, targets)
    # both must actually learn the successor structure...
    assert ref_hit > 0.5, f"reference failed to learn ({ref_hit})"
    assert our_hit > 0.5, f"ours failed to learn ({our_hit})"
    # ...and ours must match or beat the reference run
    assert our_hit >= ref_hit - 0.05, (our_hit, ref_hit)
