"""Streaming-parquet TwoTower pipeline (analog of reference examples/15 +
the ParquetModule path): write a parquet shard → ParquetModule with
template transforms → TwoTower with in-batch contrastive loss →
ANN-exported item vectors for CPU serving.

    python examples/03_streaming_twotower.py
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

from replay_tpu.ann import HnswIndex
from replay_tpu.data.nn import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.parquet import ColumnMeta, Metadata, ParquetModule
from replay_tpu.data.schema import FeatureHint, FeatureSource
from replay_tpu.nn.losses import LogInCELoss
from replay_tpu.nn.sequential import TwoTower
from replay_tpu.nn.templates import make_default_twotower_transforms
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig

N_ITEMS = 200
SEQ_LEN = 16


def write_parquet_shard(path: str, n_users=600, seed=5) -> None:
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        start = rng.integers(0, N_ITEMS)
        length = int(rng.integers(4, 30))
        rows.append(
            {
                "query_id": u,
                "item_id": [int((start + t) % N_ITEMS) for t in range(length)],
            }
        )
    pd.DataFrame(rows).to_parquet(path)


def main():
    shard = "/tmp/twotower_shard.parquet"
    write_parquet_shard(shard)

    tensor_schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            embedding_dim=32,
            padding_value=N_ITEMS,
        )
    )
    module = ParquetModule(
        metadata=Metadata(
            {
                "query_id": ColumnMeta(),
                "item_id": ColumnMeta(shape=(SEQ_LEN + 1,), padding=N_ITEMS, dtype="int32"),
            }
        ),
        train_path=shard,
        batch_size=64,
        transforms={"train": make_default_twotower_transforms(tensor_schema)["train"]},
        replica_id=0,   # multi-host: defaults to jax.process_index/count
        num_replicas=1,
    )

    model = TwoTower(schema=tensor_schema, max_sequence_length=SEQ_LEN, num_blocks=1)
    trainer = Trainer(
        model,
        LogInCELoss(temperature=0.2),
        optimizer=OptimizerFactory(3e-3),
        config=TrainerConfig(max_epochs=3, batch_size=64, max_sequence_length=SEQ_LEN),
    )
    history = trainer.fit_loader(module)
    for record in history:
        print({k: round(v, 4) for k, v in record.items()})

    # export the item tower for CPU ANN serving
    item_vectors = np.asarray(
        model.apply(
            {"params": trainer.state.params, **trainer.extra_variables},
            method=lambda m: m.body.get_item_weights(None),
        ),
        dtype=np.float32,
    )
    index = HnswIndex(dim=item_vectors.shape[1], space="ip")
    index.add_items(item_vectors)
    index.set_ef(64)
    index.save("/tmp/twotower_items.hnsw")
    print(f"item tower exported: {item_vectors.shape} -> /tmp/twotower_items.hnsw")


if __name__ == "__main__":
    main()
