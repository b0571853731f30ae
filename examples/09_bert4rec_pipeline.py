"""Bert4Rec end-to-end (analog of reference examples/10): raw log →
SequenceTokenizer → masked-LM training with validation → top-k predict →
AOT export.

    python examples/09_bert4rec_pipeline.py            # CPU
    REPLAY_TPU_DEVICE=tpu python examples/09_bert4rec_pipeline.py
"""

import os
import sys
from pathlib import Path

_device = os.environ.get("REPLAY_TPU_DEVICE", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _device)
import jax  # noqa: E402

jax.config.update("jax_platforms", _device)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.nn import (
    SequenceTokenizer,
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.nn.compiled import CompiledSequentialModel
from replay_tpu.nn.losses import CESampledLoss
from replay_tpu.nn.sequential import Bert4Rec
from replay_tpu.nn.sequential.bert4rec import mask_token_id
from replay_tpu.nn.training import LRSchedulerFactory, OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import MaskedLMTransform

N_ITEMS = 300


def synthetic_sessions(n_users=400, seed=9) -> pd.DataFrame:
    """Markov-chain item sequences (learnable transitions)."""
    rng = np.random.default_rng(seed)
    transition = rng.dirichlet(np.full(N_ITEMS, 0.05), size=N_ITEMS)
    rows = []
    for u in range(n_users):
        item = rng.integers(0, N_ITEMS)
        for t in range(int(rng.integers(8, 40))):
            rows.append((f"u{u}", f"i{item}", t))
            item = rng.choice(N_ITEMS, p=transition[item])
    return pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"])


def main():
    log = synthetic_sessions()
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    tensor_schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            embedding_dim=48,
            padding_value=N_ITEMS,
        )
    )

    # leave-last-out split
    last = log.groupby("user_id")["timestamp"].idxmax()
    train_log, test_log = log.drop(index=last), log.loc[last]

    tokenizer = SequenceTokenizer(tensor_schema)
    train_seq = tokenizer.fit_transform(Dataset(schema, train_log))
    test_seq = tokenizer.transform(Dataset(schema, test_log, check_consistency=False))

    # Bert4Rec trains by reconstructing randomly-masked positions; the mask
    # token occupies the row after padding in the item table
    model = Bert4Rec(schema=tensor_schema, max_sequence_length=32, num_blocks=2, num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(n_negatives=128),
        optimizer=OptimizerFactory(3e-3),
        scheduler=LRSchedulerFactory(warmup_steps=20, decay="cosine", total_steps=500),
        transform=MaskedLMTransform(mask_prob=0.2, mask_token=mask_token_id(tensor_schema)),
        config=TrainerConfig(max_epochs=4, batch_size=64, max_sequence_length=32),
    )
    history = trainer.fit(train_seq, val_dataset=test_seq)
    for record in history:
        print({k: round(v, 4) for k, v in record.items()})

    # predict: the model appends a mask token and reads its logits
    ids, items, scores = trainer.predict_topk(train_seq, k=10)
    print(f"\nrecommendations: {items.shape[0]} queries x {items.shape[1]} items")
    assert items.max() < N_ITEMS  # mask/padding never recommended

    compiled = CompiledSequentialModel.compile(
        model, trainer.state.params, batch_size=16, mode="batch"
    )
    compiled.save("/tmp/bert4rec_aot")
    print("AOT artifact saved to /tmp/bert4rec_aot")


if __name__ == "__main__":
    main()
