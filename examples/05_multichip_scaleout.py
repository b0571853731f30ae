"""Multi-chip scale-out: catalog-sharded training + distributed retrieval.

Runs on a VIRTUAL 8-device CPU mesh (no TPU pod needed) — the same program
runs unchanged on real hardware; on a multi-host pod, call
`replay_tpu.parallel.multihost.initialize_multihost()` first and the mesh
spans every chip.

    python examples/05_multichip_scaleout.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from jax.sharding import NamedSharding, PartitionSpec as P

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
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform
from replay_tpu.parallel import distributed_topk, make_mesh

# catalog large enough to trip the row-sharding rule (tables >=16384 rows
# shard over the model axis)
N_ITEMS = 16384
SEQ_LEN = 12


def main():
    # mesh: 4-way data parallel x 2-way catalog sharding
    mesh = make_mesh(data=4, model=2)
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.ravel())} devices")

    rng = np.random.default_rng(0)
    rows = []
    for u in range(256):
        start = rng.integers(0, 512)
        for t in range(SEQ_LEN + 2):
            rows.append((u, int((start + t) % N_ITEMS), t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    schema = TensorSchema(
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
    ds = SequentialDataset.from_interactions(schema, log)

    model = SasRec(schema=schema, max_sequence_length=SEQ_LEN, num_blocks=1, num_heads=2)
    trainer = Trainer(
        model,
        CESampledLoss(64),
        optimizer=OptimizerFactory(3e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(max_epochs=2, batch_size=32, max_sequence_length=SEQ_LEN),
        mesh=mesh,
    )
    history = trainer.fit(ds)
    for record in history:
        print({k: round(v, 4) for k, v in record.items()})

    table = trainer.state.params["body"]["embedder"]["emb_item_id"]["table"]["embedding"]
    print("item table sharding:", table.sharding.spec, "shape:", table.shape)

    # distributed retrieval: per-shard top-k + all-gather merge, catalog
    # never assembled on one device
    batch = next(ds.batches(batch_size=32, max_sequence_length=SEQ_LEN))
    hidden = model.apply(
        {"params": trainer.state.params},
        {k: v for k, v in trainer._place_batch(batch).items()},
        method=SasRec.get_query_embeddings,
    )
    item_weights = jax.device_put(
        trainer.state.params["body"]["embedder"]["emb_item_id"]["table"]["embedding"],
        NamedSharding(mesh, P("model", None)),
    )
    vals, idx = distributed_topk(hidden.astype(np.float32), item_weights, 10, mesh)
    print("distributed top-k:", np.asarray(idx).shape, "first row:", np.asarray(idx)[0][:5])


if __name__ == "__main__":
    main()
