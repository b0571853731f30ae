"""Collective-traffic audit of the sharded train step.

Compiles the bench SASRec train step over an 8-device data-parallel mesh
(virtual CPU devices — XLA inserts the same collectives it would on an ICI
ring) and reports every cross-device collective with its payload size, plus
the analytic scaling model: a data-parallel step moves exactly one gradient
all-reduce of |params| floats, so step time scales as
compute(B/n) + 2·|params|·4·(n-1)/n / ici_bw.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/ici_analysis.py
"""

import os
import re
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench as bench_mod

    bench_mod.BATCH = 256  # shape only; collective count is batch-invariant

    # reuse bench's trainer wiring, but lower instead of run
    import jax.numpy as jnp

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
    from replay_tpu.parallel import make_mesh

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=bench_mod.N_ITEMS, embedding_dim=bench_mod.DIM,
            padding_value=bench_mod.N_ITEMS,
        )
    )
    model = SasRec(schema=schema, max_sequence_length=bench_mod.SEQ_LEN,
                   num_blocks=bench_mod.BLOCKS, num_heads=bench_mod.HEADS)
    mesh = make_mesh()
    trainer = Trainer(
        model, CELoss(), optimizer=OptimizerFactory(1e-3),
        transform=NextTokenTransform(),
        config=TrainerConfig(batch_size=bench_mod.BATCH,
                             max_sequence_length=bench_mod.SEQ_LEN),
        mesh=mesh,
    )
    rng = np.random.default_rng(0)
    b, sl = bench_mod.BATCH, bench_mod.SEQ_LEN
    batch = {
        "item_id": rng.integers(0, bench_mod.N_ITEMS, (b, sl + 1)).astype(np.int32),
        "padding_mask": np.ones((b, sl + 1), dtype=np.int8),
        "batch_mask": np.ones(b, dtype=np.int8),
        "query_id": np.arange(b, dtype=np.int64),
        "seq_len": np.full(b, sl + 1, dtype=np.int32),
    }
    trainer.init_state(batch)
    step = trainer._build_train_step()
    device_batch = trainer._place_batch(batch)
    key = jax.random.PRNGKey(0)
    compiled = step.lower(trainer.state, device_batch, key).compile()
    hlo = compiled.as_text()

    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(trainer.state.params)
    )
    n_dev = mesh.devices.size
    print(f"mesh: {dict(mesh.shape)}  params: {n_params:,}")

    ops = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
           "all-to-all")
    itemsizes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "f64": 8,
                 "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}
    total_bytes = 0
    counts = {}
    for line in hlo.splitlines():
        stripped = line.strip()
        if "=" not in stripped:
            continue
        lhs, _, rhs = stripped.partition(" = ")
        op = next((o for o in ops if rhs.startswith(f"{o}(")
                   or re.match(rf"\(?[\w\[\],{{}} ]+\)? {o}\(", rhs)), None)
        if op is None:
            # HLO prints "<shape> all-reduce(...)": shape precedes the op
            m = re.match(r"(.+?) (" + "|".join(ops) + r")\(", rhs)
            if not m:
                continue
            op = m.group(2)
            shapes_src = m.group(1)
        else:
            shapes_src = rhs.split(f"{op}(")[0]
        nbytes = 0
        for ty, dims in re.findall(r"(\w+)\[([\d,]*)\]", shapes_src):
            elems = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
            nbytes += elems * itemsizes.get(ty, 4)
        total_bytes += nbytes
        counts[op] = counts.get(op, 0) + 1
        label = shapes_src.strip()[:48]
        print(f"  {op:>20}  {label:<50} {nbytes/1e6:8.2f} MB")
    print(f"collectives: {counts}  total payload {total_bytes/1e6:.2f} MB")
    grad_bytes = n_params * 4
    print(f"analytic DP bound: one {grad_bytes/1e6:.2f} MB grad all-reduce/step")
    ring = 2 * grad_bytes * (n_dev - 1) / n_dev
    for bw, name in ((4.5e10, "v5e 1-ring 45 GB/s"), (9e10, "v5e 2D 90 GB/s")):
        print(f"  ring time at {name}: {ring/bw*1e6:.0f} us/step")


if __name__ == "__main__":
    main()
