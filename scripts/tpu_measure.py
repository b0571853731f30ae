"""One-shot TPU measurement sweep: the round-1/2 PENDING list.

Run on a live chip:  python scripts/tpu_measure.py [--quick]

Covers: SASRec train throughput (batch sweep), CELossTiled f32 vs bf16
fwd+bwd at 1M items, fused_topk iterative vs bitonic vs XLA across k,
classical fits at ML-1M scale (ALS / SLIM / KNN / PopRec), parquet-fed
streaming step rate. Prints a markdown-ish table; paste into PERF.md.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _force(out):
    """Force REAL completion: under the axon remote-TPU tunnel,
    block_until_ready returns at enqueue time — only a device→host
    transfer of a value observes execution."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timed(fn, *args, warmup=2, iters=5, **kwargs):
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        _force(out)
    return (time.perf_counter() - t0) / iters


def bench_sasrec(quick=False):
    import bench as bench_mod

    for batch in ([4096] if quick else [256, 1024, 4096, 8192]):
        bench_mod.BATCH = batch
        rate = bench_mod.bench_jax()
        print(f"| sasrec train | batch {batch} | {rate/1e3:.0f}k ex/s |")


def bench_tiled_ce(quick=False):
    import jax
    import jax.numpy as jnp

    from replay_tpu.nn.tiled_ce import CELossTiled

    B, L, D, N = 512, 50, 64, 1_000_000
    key = jax.random.PRNGKey(0)
    hidden = jax.random.normal(key, (B, L, D), dtype=jnp.float32)
    labels = jax.random.randint(key, (B, L), 0, N)
    mask = jnp.ones((B, L))
    weights = jax.random.normal(key, (N, D)) * 0.05

    variants = [("scan", None), ("scan", "bfloat16"),
                ("flash", None), ("flash", "bfloat16")]
    for impl, dtype in variants:
        loss = CELossTiled(tile=8192, compute_dtype=dtype, impl=impl)
        grad_fn = jax.jit(jax.grad(lambda h, w, _l=loss: _l(h, labels, mask, w),
                                   argnums=(0, 1)))
        try:
            dt = timed(grad_fn, hidden, weights, warmup=1, iters=3 if quick else 5)
        except Exception as exc:
            print(f"| tiled CE fwd+bwd | {impl} {dtype or 'f32'} | FAILED {type(exc).__name__} |")
            continue
        flops = 4 * 2 * B * L * N * D  # 4 streaming GEMMs (flash: 5)
        print(f"| tiled CE fwd+bwd | {impl} {dtype or 'f32'} | {dt*1000:.0f} ms | {flops/dt/1e12:.1f} TFLOP/s |")


def bench_train_step_losses(quick=False):
    """The bench.py step with dense CE vs tiled-scan vs flash CE: the dense
    [M, 3706] logits buffer is the honest step's dominant cost."""
    import jax

    import bench as bench_mod
    from replay_tpu.nn.losses import CELoss
    from replay_tpu.nn.tiled_ce import CELossTiled

    losses = [
        ("dense CELoss", CELoss()),
        ("tiled scan bf16", CELossTiled(tile=2048, compute_dtype="bfloat16", impl="scan")),
        ("flash bf16", CELossTiled(tile=2048, compute_dtype="bfloat16", impl="flash")),
        ("flash f32", CELossTiled(tile=2048, impl="flash")),
    ]
    bench_mod.BATCH = 4096
    for name, loss in losses:
        try:
            rate = bench_mod.bench_jax(loss=loss)
        except Exception as exc:
            print(f"| sasrec step b4096 | {name} | FAILED {type(exc).__name__}: {exc} |")
            continue
        print(f"| sasrec step b4096 | {name} | {rate/1e3:.0f}k ex/s |")


def bench_topk(quick=False):
    import jax.numpy as jnp

    from replay_tpu.ops.pallas_topk import fused_topk, topk_reference

    rng = np.random.default_rng(0)
    configs = [(256, 1_000_000, 128, 10), (256, 1_000_000, 256, 100)]
    if not quick:
        configs += [(1024, 1_000_000, 128, 10), (256, 1_000_000, 256, 128)]
    for b, n, d, k in configs:
        q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        t_ref = timed(topk_reference, q, w, k, iters=3)
        row = f"| topk B={b} N={n} D={d} k={k} | XLA {t_ref*1000:.1f} ms |"
        for method in (["iterative"] if k <= 32 else ["iterative", "bitonic"]):
            try:
                t = timed(fused_topk, q, w, k, method=method, iters=3)
                row += f" {method} {t*1000:.1f} ms ({t_ref/t:.2f}x) |"
            except Exception as exc:  # lowering failure is a result too
                row += f" {method} FAILED ({type(exc).__name__}) |"
        print(row)


def bench_topk_budget(quick=False):
    """Round-4 large-k kernel: fused_topk_budget vs XLA dense vs iterative
    at k=100/128, 1M items.  Weights GENERATED on device (the tunnel's
    host→device path cannot move 1 GB — round-3 note)."""
    import jax
    import jax.numpy as jnp

    from replay_tpu.ops.pallas_topk import (
        fused_topk,
        fused_topk_budget,
        topk_reference,
    )

    key = jax.random.PRNGKey(0)
    b, n, d = 256, 1_000_000, 256
    for dtype in ([jnp.float32] if quick else [jnp.float32, jnp.bfloat16]):
        q = jax.random.normal(key, (b, d), dtype=dtype)
        w = jax.random.normal(jax.random.fold_in(key, 1), (n, d), dtype=dtype)
        for k in [100, 128] if not quick else [100]:
            t_ref = timed(topk_reference, q, w, k, iters=3)
            row = f"| topk B={b} N={n} D={d} k={k} {jnp.dtype(dtype).name} | XLA {t_ref*1000:.1f} ms |"
            try:
                t_b = timed(fused_topk_budget, q, w, k, iters=3)
                row += f" budget {t_b*1000:.1f} ms ({t_ref/t_b:.2f}x) |"
            except Exception as exc:
                row += f" budget FAILED ({type(exc).__name__}) |"
            try:
                t_i = timed(fused_topk, q, w, k, method="iterative", iters=3)
                row += f" iterative {t_i*1000:.1f} ms ({t_ref/t_i:.2f}x) |"
            except Exception as exc:
                row += f" iterative FAILED ({type(exc).__name__}) |"
            print(row)
        # small-k sanity: does budget also beat the plain kernel at k<=32?
        for k in [10]:
            t_i = timed(fused_topk, q, w, k, method="iterative", iters=3)
            t_b = timed(fused_topk_budget, q, w, k, budget=4, iters=3)
            print(f"| topk k={k} {jnp.dtype(dtype).name} | iterative {t_i*1000:.1f} ms | budget(4) {t_b*1000:.1f} ms |")


def bench_classical(quick=False):
    import pandas as pd

    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )
    from replay_tpu.models import ALSWrap, ItemKNN, PopRec, SLIM

    rng = np.random.default_rng(0)
    n_u, n_i = 6040, 3706
    u = rng.integers(0, n_u, 840_000)
    i = (rng.zipf(1.3, 840_000) - 1) % n_i
    df = pd.DataFrame({"user_id": u, "item_id": i, "rating": 1.0, "timestamp": 0}).drop_duplicates(
        ["user_id", "item_id"]
    ).head(420_000)
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                        feature_source=FeatureSource.INTERACTIONS),
        ]
    )
    ds = Dataset(schema, df)
    models = [
        ("PopRec", PopRec()),
        ("ItemKNN", ItemKNN()),
        ("ALS rank=32 it=10", ALSWrap(rank=32, seed=0, num_iterations=10)),
        ("SLIM", SLIM()),
    ]
    for name, model in models:
        t0 = time.perf_counter()
        model.fit(ds)
        fit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        model.predict(ds, k=10)
        pred_t = time.perf_counter() - t0
        print(f"| {name} | fit {fit_t:.1f}s | predict k=10 {pred_t:.1f}s |")


def bench_als_ml20m(quick=False):
    """ALS at ML-20M catalog scale (26,744 items × synthetic users) — the
    configuration BASELINE.json lists for the reference's blocked
    distributed ALS (ReplayALS.scala; replay/models/als.py:76-82).  One
    chip; the mesh= sharded fit is equivalence-tested on the virtual mesh
    (tests/models/test_factorization.py)."""
    import pandas as pd

    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )
    from replay_tpu.models import ALSWrap

    rng = np.random.default_rng(0)
    n_u = 20_000 if quick else 138_000
    n_i = 26_744
    n_rows = 1_500_000 if quick else 12_000_000
    u = rng.integers(0, n_u, n_rows)
    i = (rng.zipf(1.2, n_rows) - 1) % n_i
    df = pd.DataFrame({"user_id": u, "item_id": i, "rating": 1.0}).drop_duplicates(
        ["user_id", "item_id"]
    )
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                        feature_source=FeatureSource.INTERACTIONS),
        ]
    )
    ds = Dataset(schema, df)
    print(f"log: {len(df)} rows, {df.user_id.nunique()} users, "
          f"{df.item_id.nunique()} items")
    model = ALSWrap(rank=64, seed=0, num_iterations=10)
    t0 = time.perf_counter()
    model.fit(ds)
    print(f"| ALS rank=64 it=10 ML-20M scale | fit {time.perf_counter()-t0:.1f}s |")
    t0 = time.perf_counter()
    model.predict(ds, k=10, queries=df.user_id.unique()[:8192])
    print(f"| ALS predict k=10, 8192 queries | {time.perf_counter()-t0:.1f}s |")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--only", default=None,
                        choices=[None, "sasrec", "step_losses", "ce", "topk",
                                 "topk_budget", "classical", "als20m"])
    args = parser.parse_args()
    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    suites = {
        "sasrec": bench_sasrec,
        "step_losses": bench_train_step_losses,
        "ce": bench_tiled_ce,
        "topk": bench_topk,
        "topk_budget": bench_topk_budget,
        "classical": bench_classical,
        "als20m": bench_als_ml20m,
    }
    for name, fn in suites.items():
        if args.only and name != args.only:
            continue
        print(f"\n== {name} ==")
        try:
            fn(quick=args.quick)
        except Exception as exc:
            print(f"{name} suite failed: {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
