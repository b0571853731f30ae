"""Worker for the 2-process MODEL-AXIS collectives run (round-4 verdict #2).

The data-parallel multiprocess proof (mp_train_worker.py) never moves
model-axis traffic across a process boundary.  This worker builds a mesh
whose ``model`` axis spans BOTH processes (4 virtual CPU devices each → one
8-way model axis over Gloo) and executes the cross-rank schedules the
reference delegates to torch.distributed/Lightning
(reference: replay/data/nn/parquet/info/replicas.py:7-68,
replay/nn/lightning/module.py:66-74):

1. ``a2a_sharded_lookup`` forward — the 2×all_to_all ID-exchange schedule,
   with duplicate ids in the batch;
2. its backward — cotangents riding the reverse all_to_all and
   scatter-adding into the OWNER process's table shards;
3. the forced-overflow path — a skewed batch whose per-owner bucket count
   exceeds capacity flips the global certificate and every process must
   take the exact psum fallback branch together;
4. ``distributed_topk`` — shard-local top-k + cross-process all_gather;
5. one ``ALSWrap(mesh=...)`` fit — the solve-batch rows sharded over the
   process-spanning model axis.

Every result is allgathered to the host and saved; the driver compares the
two processes' files bitwise and the 2-process run vs the 1-process run at
≤2e-8.  Spawned by tests/parallel/test_multiprocess_model_axis.py and
scripts/dryrun_multiprocess.py --model-axis:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python scripts/mp_model_axis_worker.py --process-id 0 --num-processes 2 \
        --port 12358 --out p0.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override

N_ROWS = 1024
DIM = 64
N_IDS = 512
N_QUERIES = 32
TOPK = 10


def host_inputs():
    """Deterministic inputs, identical on every process."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    table = rng.normal(size=(N_ROWS, DIM)).astype(np.float32)
    ids = rng.integers(0, N_ROWS, size=N_IDS).astype(np.int32)
    ids[::7] = ids[0]  # duplicates on purpose: backward must accumulate
    cot = rng.normal(size=(N_IDS, DIM)).astype(np.float32)
    queries = rng.normal(size=(N_QUERIES, DIM)).astype(np.float32)
    # skewed batch: ~90% of ids owned by shard 0 → bucket overflow at the
    # default capacity, certificate flips, psum fallback must engage
    skewed = ids.copy()
    shard_rows = N_ROWS // 8
    skewed[: int(N_IDS * 0.9)] = rng.integers(0, shard_rows, size=int(N_IDS * 0.9))
    return table, ids, cot, queries, skewed


def place(arr, mesh, spec):
    """Global array from a host copy every process holds in full."""
    from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: F401

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def fetch(x):
    """Device→host for a possibly process-spanning array."""
    import numpy as np

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def run_tasks(mesh):
    import numpy as np

    from replay_tpu.parallel.sharded_embedding import a2a_sharded_lookup
    from replay_tpu.parallel.distributed_topk import distributed_topk
    from jax.sharding import PartitionSpec as P

    table_h, ids_h, cot_h, queries_h, skewed_h = host_inputs()
    table = place(table_h, mesh, P("model", None))
    ids = place(ids_h, mesh, P("model"))
    cot = place(cot_h, mesh, P("model", None))
    skewed = place(skewed_h, mesh, P("model"))
    queries = place(queries_h, mesh, P())

    out = {}

    # 1. forward: the fast 2×all_to_all schedule
    fwd = a2a_sharded_lookup(table, ids, mesh, axis="model")
    out["a2a_fwd"] = fetch(fwd)

    # 2. backward: cotangent rides the reverse all_to_all, scatter-adds
    #    into owner shards (duplicate ids accumulate)
    import jax.numpy as jnp

    def loss_fn(t, i, c):
        return jnp.sum(a2a_sharded_lookup(t, i, mesh, axis="model") * c)

    grad = jax.grad(loss_fn)(table, ids, cot)
    out["a2a_grad"] = fetch(grad)

    # 3. forced overflow → exact psum fallback (same code path, skewed ids)
    fwd_ov = a2a_sharded_lookup(table, skewed, mesh, axis="model")
    out["a2a_overflow_fwd"] = fetch(fwd_ov)
    grad_ov = jax.grad(loss_fn)(table, skewed, cot)
    out["a2a_overflow_grad"] = fetch(grad_ov)
    # certify the fallback really engaged: exact expectation from the host
    expect = table_h[np.asarray(skewed_h)]
    np.testing.assert_allclose(out["a2a_overflow_fwd"], expect, atol=1e-6)

    # 4. distributed top-k across the process-spanning axis
    vals, idx = distributed_topk(queries, table, TOPK, mesh, axis="model")
    out["topk_vals"] = fetch(vals)
    out["topk_idx"] = fetch(idx).astype(np.int64)

    # 5. ALS solve with the solve-batch rows sharded over the model axis
    out.update(run_als(mesh))
    return out


def run_als(mesh):
    import numpy as np
    import pandas as pd

    from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
    from replay_tpu.data.schema import FeatureSource
    from replay_tpu.models import ALSWrap

    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    n = 4000
    log = pd.DataFrame(
        {
            "query_id": rng.integers(0, 80, n),
            "item_id": rng.integers(0, 120, n),
            "rating": rng.random(n).astype(np.float64) + 0.5,
        }
    ).drop_duplicates(["query_id", "item_id"])
    schema = FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    ds = Dataset(schema, log, check_consistency=False)
    model = ALSWrap(rank=16, num_iterations=3, seed=13, mesh=mesh)
    model.fit(ds)
    return {
        "als_query_factors": np.asarray(model.query_factors),
        "als_item_factors": np.asarray(model.item_factors),
    }


def main(argv=None):
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from replay_tpu.parallel.multihost import initialize_multihost, make_global_mesh

    if args.num_processes > 1:
        initialize_multihost(
            f"localhost:{args.port}", args.num_processes, args.process_id
        )
        assert jax.process_count() == args.num_processes
    assert jax.device_count() == 8, jax.device_count()
    mesh = make_global_mesh(model=8)  # the model axis SPANS both processes

    out = run_tasks(mesh)
    np.savez(args.out, **out)
    print(f"worker {args.process_id}: done, {len(out)} results", flush=True)


if __name__ == "__main__":
    sys.exit(main())
