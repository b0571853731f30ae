"""Training-quality parity vs the reference's own torch Bert4Rec.

Same protocol as test_sasrec_quality.py: the reference's pure-torch
``Bert4RecModel`` (replay/models/nn/sequential/bert4rec/model.py:10) and
replay_tpu's flax Bert4Rec train masked-LM on the SAME successor-pattern
log with matched capacity; both rank held-out next items, and the flax
model must match or beat the reference's HitRate@10.
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
    seqs = _make_sequences(seed=3)
    train = [s[:-1] for s in seqs]
    targets = [s[-1] for s in seqs]
    return train, targets


def _train_reference_torch(reference, train, targets):
    import torch
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn.schema import TensorFeatureInfo, TensorFeatureSource, TensorSchema
    from replay.models.nn.sequential.bert4rec.model import Bert4RecModel

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
    torch.manual_seed(0)
    model = Bert4RecModel(
        schema=schema, max_len=SEQ_LEN, hidden_size=DIM, num_blocks=1, num_heads=2,
        dropout=0.1, enable_embedding_tying=True,
    )
    ids = torch.tensor(train, dtype=torch.long)  # [U, SEQ_LEN]
    u = ids.shape[0]
    pad_mask = torch.ones_like(ids, dtype=torch.bool)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    gen = torch.Generator().manual_seed(1)
    model.train()
    for _ in range(80):
        # BERT masking: token_mask 0 at positions to reconstruct
        masked = torch.rand(ids.shape, generator=gen) < 0.3
        masked[masked.sum(dim=1) == 0, -1] = True  # ≥1 mask per row
        token_mask = ~masked
        opt.zero_grad()
        logits = model({"item_id": ids}, pad_mask, token_mask)
        sel = masked
        loss = torch.nn.functional.cross_entropy(
            logits[sel][:, :N_ITEMS], ids[sel]
        )
        loss.backward()
        opt.step()
    model.eval()
    with torch.no_grad():
        # predict the NEXT item: shift left, mask the final slot
        shifted = torch.cat([ids[:, 1:], torch.zeros(u, 1, dtype=torch.long)], dim=1)
        token_mask = torch.ones_like(shifted, dtype=torch.bool)
        token_mask[:, -1] = False
        scores = model.predict({"item_id": shifted}, pad_mask, token_mask)[:, :N_ITEMS]
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
    from replay_tpu.nn.sequential.bert4rec import Bert4Rec, mask_token_id
    from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
    from replay_tpu.nn.transforms import MaskedLMTransform

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
    model = Bert4Rec(
        schema=schema, max_sequence_length=SEQ_LEN, num_blocks=1, num_heads=2
    )
    trainer = Trainer(
        model,
        CELoss(),
        optimizer=OptimizerFactory(1e-2),
        transform=MaskedLMTransform(mask_prob=0.3, mask_token=mask_token_id(schema)),
        config=TrainerConfig(
            max_epochs=80, batch_size=128, max_sequence_length=SEQ_LEN, seed=0
        ),
    )
    trainer.fit(ds)
    qids, items, _ = trainer.predict_topk(ds, k=10, filter_seen=False)
    order = np.argsort(qids)
    return _hitrate_at10(items[order], targets)


def test_bert4rec_matches_reference_training_quality(reference, split_sequences):
    train, targets = split_sequences
    ref_hit = _train_reference_torch(reference, train, targets)
    our_hit = _train_ours(train, targets)
    assert ref_hit > 0.4, f"reference failed to learn ({ref_hit})"
    assert our_hit > 0.4, f"ours failed to learn ({our_hit})"
    assert our_hit >= ref_hit - 0.05, (our_hit, ref_hit)
