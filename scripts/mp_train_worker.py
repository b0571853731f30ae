"""Worker for the REAL 2-process `jax.distributed` CPU training run.

This is the first actual multi-process execution of the multihost path
(VERDICT r3 #4): `initialize_multihost` → process-spanning mesh → each
process streams ITS OWN parquet shard (ParquetDataset's default
ReplicasInfo reads `jax.process_index/count`) → `Trainer.fit_loader` runs
N SPMD steps with per-host batch assembly
(`parallel.multihost.place_local_batch` — no batch rows cross hosts) →
params land replicated and must be identical across processes AND equal to
a single-process run over the same global batch stream.

Reference contract being executed for real: the DataLoader-workers × DDP-
ranks replica math of replay/data/nn/parquet/info/replicas.py:7-68 plus
Lightning DDP's grad all-reduce, here as one Gloo all-reduce inserted by
GSPMD.

Spawned by tests/parallel/test_multiprocess.py and
scripts/dryrun_multiprocess.py:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python scripts/mp_train_worker.py --process-id 0 --num-processes 2 \
        --port 12357 --train t.parquet --out p0.npz --epochs 2
"""

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override

SEQ_PAD = 9
MAX_LEN = 8
N_ITEMS = 50
GLOBAL_BATCH = 32


def build_module(train_path: str, local_batch: int, replica=None):
    """ParquetModule over the per-replica shard (default: jax process)."""
    from replay_tpu.data.nn.parquet.metadata import ColumnMeta, Metadata
    from replay_tpu.data.nn.parquet.parquet_module import ParquetModule
    from replay_tpu.nn.transforms import RenameTransform

    kwargs = {}
    if replica is not None:
        kwargs = {"replica_id": replica[0], "num_replicas": replica[1]}
    return ParquetModule(
        metadata=Metadata(
            {
                "query_id": ColumnMeta(),
                "item_id": ColumnMeta(shape=(SEQ_PAD,), padding=N_ITEMS, dtype="int32"),
            }
        ),
        train_path=train_path,
        batch_size=local_batch,
        shuffle_train=False,  # bit-stable batch streams for the equivalence check
        transforms={"train": RenameTransform({"item_id_mask": "padding_mask"})},
        **kwargs,
    )


def build_trainer(mesh, steps_per_dispatch: int = 1):
    from replay_tpu.data.nn.schema import (
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource
    from replay_tpu.nn.losses import CELoss
    from replay_tpu.nn.sequential.sasrec import SasRec
    from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
    from replay_tpu.nn.transforms import NextTokenTransform

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            embedding_dim=16,
            padding_value=N_ITEMS,
        )
    )
    model = SasRec(
        schema=schema, max_sequence_length=MAX_LEN, num_blocks=1, num_heads=2,
        dropout_rate=0.0,
    )
    return Trainer(
        model,
        CELoss(),
        # SGD: float-reorder noise from adaptive optimizers would blur the
        # cross-process equality this run exists to prove
        optimizer=OptimizerFactory(1e-1, algorithm="sgd"),
        transform=NextTokenTransform(),
        config=TrainerConfig(
            max_epochs=2, batch_size=GLOBAL_BATCH, max_sequence_length=MAX_LEN,
            seed=0, steps_per_dispatch=steps_per_dispatch,
        ),
        mesh=mesh,
    )


def flatten_params(params):
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(jax.device_get(v))
        for path, v in flat
    }


class _EmulatedGlobalModule:
    """Single-process stand-in that rebuilds the SAME global batch stream
    the 2-process run sees: zip the per-replica shard loaders, concatenate
    each step's shard batches in process order."""

    def __init__(self, train_path: str, shards: int, local_batch: int):
        self.mods = [
            build_module(train_path, local_batch, replica=(r, shards))
            for r in range(shards)
        ]

    def loader(self, split: str, epoch: int = 0):
        import numpy as np

        iters = [m.loader(split, epoch) for m in self.mods]
        for batches in zip(*iters):
            yield {
                k: np.concatenate([b[k] for b in batches]) for k in batches[0]
            }

    def transform_for(self, split: str):
        return self.mods[0].transform_for(split)


def main(argv=None):
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--train", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps-per-dispatch", type=int, default=1)
    p.add_argument(
        "--emulate-shards", type=int, default=0,
        help="single-process reference: rebuild the N-shard global batch "
        "stream in one process (requires --num-processes 1)",
    )
    args = p.parse_args(argv)

    from replay_tpu.parallel.multihost import (
        initialize_multihost,
        local_replica_info,
        make_global_mesh,
    )

    if args.emulate_shards:
        assert args.num_processes == 1
        module = _EmulatedGlobalModule(
            args.train, args.emulate_shards, GLOBAL_BATCH // args.emulate_shards
        )
    else:
        initialize_multihost(
            f"localhost:{args.port}", args.num_processes, args.process_id
        )
        assert jax.process_count() == args.num_processes
        rank, world = local_replica_info()
        assert (rank, world) == (args.process_id, args.num_processes)

        # DEFAULT replica info — the JaxProcessInfo path must pick this
        # process's shard off jax.process_index() by itself
        module = build_module(args.train, GLOBAL_BATCH // args.num_processes)
        ds = module.dataset("train")
        assert ds._replica == (args.process_id, args.num_processes), ds._replica

    mesh = make_global_mesh(model=1)
    trainer = build_trainer(mesh, args.steps_per_dispatch)
    history = trainer.fit_loader(module, max_epochs=args.epochs)
    out = flatten_params(trainer.state.params)
    out["__losses__"] = np.asarray([h["loss"] for h in history], np.float64)
    np.savez(args.out, **out)
    print(f"worker {args.process_id}: done, {len(out)-1} param leaves", flush=True)


if __name__ == "__main__":
    sys.exit(main())
