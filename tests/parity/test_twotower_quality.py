"""Training-quality parity vs the reference's own torch TwoTower.

Completes the sequential-model trio (SasRec, Bert4Rec, TwoTower): the
reference's TwoTower.from_params (replay/nn/sequential/twotower/model.py:431,
pure torch once lightning is stubbed) trains next-token CE on the same
successor-pattern log; replay_tpu's TwoTower must match or beat its
HitRate@10 on held-out next items.
"""

import numpy as np
import pandas as pd
import pytest

from tests.parity.test_sasrec_quality import (
    DIM,
    N_ITEMS,
    SEQ_LEN,
    _hitrate_at10,
    _make_sequences,
)


@pytest.fixture(scope="module")
def split_sequences():
    seqs = _make_sequences(seed=5)
    train = [s[:-1] for s in seqs]
    targets = [s[-1] for s in seqs]
    return train, targets


def _train_reference_torch(reference, train, targets, tmp_path):
    import torch
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn.schema import TensorFeatureInfo, TensorFeatureSource, TensorSchema
    from replay.nn.sequential.twotower import FeaturesReader, TwoTower

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
    catalog_path = str(tmp_path / "item_catalog.parquet")
    pd.DataFrame({"item_id": np.arange(N_ITEMS)}).to_parquet(catalog_path)
    reader = FeaturesReader(schema=schema, metadata={"item_id": {}}, path=catalog_path)
    torch.manual_seed(0)
    model = TwoTower.from_params(
        schema, reader, embedding_dim=DIM, num_heads=2, num_blocks=1,
        max_sequence_length=SEQ_LEN - 1, dropout=0.1,
    )
    ids = torch.tensor(train, dtype=torch.long)
    inputs, labels = ids[:, :-1], ids[:, 1:]
    pad_mask = torch.ones_like(inputs, dtype=torch.bool)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    model.train()
    for _ in range(60):
        opt.zero_grad()
        out = model.forward_train(
            feature_tensors={"item_id": inputs},
            padding_mask=pad_mask,
            positive_labels=labels[..., None],        # [B, L, 1] num_positives
            negative_labels=None,
            target_padding_mask=pad_mask[..., None],
        )
        out["loss"].backward()
        opt.step()
    model.eval()
    with torch.no_grad():
        last = ids[:, 1:]  # most recent SEQ_LEN-1 items
        out = model.forward_inference(
            feature_tensors={"item_id": last},
            padding_mask=torch.ones_like(last, dtype=torch.bool),
        )
        logits = out["logits"] if isinstance(out, dict) else out.logits
        scores = logits[:, :N_ITEMS]
    ranked = torch.argsort(scores, dim=1, descending=True).numpy()
    return _hitrate_at10(ranked, targets)


def _train_ours(train, targets):
    from replay_tpu.data.nn import (
        SequentialDataset,
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource
    from replay_tpu.nn.losses import CELoss
    from replay_tpu.nn.sequential.twotower import TwoTower
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
    rows = [(u, item, t) for u, seq in enumerate(train) for t, item in enumerate(seq)]
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    ds = SequentialDataset.from_interactions(schema, log)
    model = TwoTower(
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


def test_twotower_matches_reference_training_quality(reference, split_sequences, tmp_path):
    train, targets = split_sequences
    ref_hit = _train_reference_torch(reference, train, targets, tmp_path)
    our_hit = _train_ours(train, targets)
    assert ref_hit > 0.4, f"reference failed to learn ({ref_hit})"
    assert our_hit > 0.4, f"ours failed to learn ({our_hit})"
    assert our_hit >= ref_hit - 0.05, (our_hit, ref_hit)
