"""Feature-rich sequential models (analog of reference
examples/features_for_sequential_models.ipynb): item-side and query-side
features flow through the SequenceTokenizer into a multi-feature SasRec —
item categories arrive via ITEM_FEATURES joins, user segment via
QUERY_FEATURES, and the model sums the embeddings per position.

    python examples/12_features_for_sequential.py            # CPU
    REPLAY_TPU_DEVICE=tpu python examples/12_features_for_sequential.py
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
from replay_tpu.nn.losses import CESampledLoss
from replay_tpu.nn.sequential import SasRec
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform

N_ITEMS = 200
N_CATEGORIES = 8


def synthetic_catalog(seed=5):
    """Items belong to categories; users binge within their segment's
    preferred categories — so category embeddings carry real signal."""
    rng = np.random.default_rng(seed)
    item_cat = rng.integers(0, N_CATEGORIES, N_ITEMS)
    items = pd.DataFrame(
        {"item_id": [f"i{i}" for i in range(N_ITEMS)],
         "category": [f"c{c}" for c in item_cat]}
    )
    rows, users = [], []
    for u in range(300):
        segment = u % 2
        users.append((f"u{u}", f"s{segment}"))
        # segment 0 walks categories 0-3, segment 1 walks 4-7
        cats = np.arange(0, 4) if segment == 0 else np.arange(4, 8)
        for t in range(int(rng.integers(10, 30))):
            cat = rng.choice(cats)
            candidates = np.nonzero(item_cat == cat)[0]
            rows.append((f"u{u}", f"i{rng.choice(candidates)}", t))
    log = pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"])
    user_features = pd.DataFrame(users, columns=["user_id", "segment"])
    return log, items, user_features


def main():
    log, items, user_features = synthetic_catalog()
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "timestamp", FeatureType.NUMERICAL, feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo("category", FeatureType.CATEGORICAL,
                        feature_source=FeatureSource.ITEM_FEATURES),
            FeatureInfo("segment", FeatureType.CATEGORICAL,
                        feature_source=FeatureSource.QUERY_FEATURES),
        ]
    )
    dataset = Dataset(schema, log, query_features=user_features, item_features=items)

    dim = 32
    tensor_schema = TensorSchema(
        [
            TensorFeatureInfo(
                "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                embedding_dim=dim,
            ),
            TensorFeatureInfo(
                "category", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_sources=[TensorFeatureSource(FeatureSource.ITEM_FEATURES, "category")],
                embedding_dim=dim,
            ),
            TensorFeatureInfo(
                "segment", TensorFeatureType.CATEGORICAL, is_seq=True,
                feature_sources=[TensorFeatureSource(FeatureSource.QUERY_FEATURES, "segment")],
                embedding_dim=dim,
            ),
        ]
    )

    tokenizer = SequenceTokenizer(tensor_schema)
    seq = tokenizer.fit_transform(dataset)
    print(f"{len(seq)} query sequences; cardinalities:",
          {n: tokenizer.tensor_schema[n].cardinality for n in tensor_schema})

    model = SasRec(schema=tokenizer.tensor_schema, max_sequence_length=24,
                   num_blocks=2, num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(n_negatives=64),
        optimizer=OptimizerFactory(3e-3),
        transform=NextTokenTransform(apply_to=["item_id", "category", "segment"]),
        config=TrainerConfig(max_epochs=3, batch_size=64, max_sequence_length=24),
    )
    history = trainer.fit(seq)
    losses = [r["loss"] for r in history]
    print("epoch losses:", [round(v, 3) for v in losses])
    assert losses[-1] < losses[0], "multi-feature model should learn"

    ids, top_items, scores = trainer.predict_topk(seq, k=5)
    print(f"top-5 recommendations for {len(ids)} queries; "
          f"first row: {top_items[0].tolist()}")


if __name__ == "__main__":
    main()
