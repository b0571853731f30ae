"""Drive the real 2-process `jax.distributed` CPU training run end to end.

Spawns two `scripts/mp_train_worker.py` processes (4 virtual CPU devices
each → one 8-device process-spanning mesh, Gloo collectives), plus a
single-process reference consuming the identical global batch stream, and
asserts:

1. params after training are IDENTICAL (bitwise) across the two processes
   — the replicated state never diverges;
2. params match the single-process run — the multi-process mesh changes
   placement, not math;
3. per-epoch losses match.

Prints one JSON line with the verdict.  Usage: `python
scripts/dryrun_multiprocess.py [--tmp DIR]`.

This is the closest in-image execution of the reference's 2-host DDP
contract (replay/data/nn/parquet/info/replicas.py:7-68; SURVEY.md §2.8).
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def write_train_parquet(path: str, n_users: int = 64, seed: int = 5) -> None:
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        length = int(rng.integers(3, 10))
        items = rng.integers(0, 50, length)
        items[:: max(2, length // 3)] = items[0]  # duplicate ids on purpose
        rows.append((u, items.tolist()))
    pd.DataFrame(rows, columns=["query_id", "item_id"]).to_parquet(path)


def run(tmpdir: str, epochs: int = 2, timeout: int = 600,
        steps_per_dispatch: int = 1) -> dict:
    import numpy as np

    train = os.path.join(tmpdir, "train.parquet")
    write_train_parquet(train)
    port = _free_port()
    worker = str(REPO / "scripts" / "mp_train_worker.py")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # the worker forces cpu itself
    outs = [os.path.join(tmpdir, f"p{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker,
                "--process-id", str(i), "--num-processes", "2",
                "--port", str(port), "--train", train,
                "--out", outs[i], "--epochs", str(epochs),
                "--steps-per-dispatch", str(steps_per_dispatch),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        logs.append(out.decode(errors="replace"))
    if any(p.returncode != 0 for p in procs):
        raise RuntimeError(
            "worker failed:\n--- p0 ---\n" + logs[0] + "\n--- p1 ---\n" + logs[1]
        )

    ref_env = dict(os.environ)
    ref_env["PYTHONPATH"] = str(REPO) + os.pathsep + ref_env.get("PYTHONPATH", "")
    ref_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    ref_env.pop("JAX_PLATFORMS", None)
    ref_out = os.path.join(tmpdir, "ref.npz")
    ref = subprocess.run(
        [
            sys.executable, worker,
            "--num-processes", "1", "--emulate-shards", "2",
            "--train", train, "--out", ref_out, "--epochs", str(epochs),
            "--steps-per-dispatch", str(steps_per_dispatch),
        ],
        env=ref_env,
        capture_output=True,
        cwd=str(REPO),
        timeout=timeout,
    )
    if ref.returncode != 0:
        raise RuntimeError("reference failed:\n" + ref.stderr.decode(errors="replace"))

    p0, p1, r = (np.load(o) for o in (outs[0], outs[1], ref_out))
    keys = sorted(k for k in p0.files if k != "__losses__")
    assert keys == sorted(k for k in r.files if k != "__losses__")
    max_cross = 0.0
    for k in keys:
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=f"cross-process {k}")
        diff = float(np.max(np.abs(p0[k] - r[k])))
        max_cross = max(max_cross, diff)
        np.testing.assert_allclose(
            p0[k], r[k], atol=2e-5, rtol=2e-5, err_msg=f"vs single-process {k}"
        )
    np.testing.assert_allclose(p0["__losses__"], r["__losses__"], rtol=1e-5)
    return {
        "ok": True,
        "steps_per_dispatch": steps_per_dispatch,
        "processes": 2,
        "devices": 8,
        "param_leaves": len(keys),
        "epoch_losses": [float(x) for x in p0["__losses__"]],
        "max_abs_diff_vs_single_process": max_cross,
    }


def run_model_axis(tmpdir: str, timeout: int = 600) -> dict:
    """The MODEL-AXIS cross-process proof (round-4 verdict #2): spawn two
    4-device processes whose mesh's model axis spans both, run
    scripts/mp_model_axis_worker.py (a2a lookup fwd+bwd, forced overflow →
    psum fallback, distributed_topk, one ALSWrap(mesh) solve), and compare
    against a single-process 8-device run of the same worker.

    Collectives must be BITWISE equal; the ALS factors are held to the same
    rtol 2e-4 / atol 2e-5 the in-process sharded-vs-unsharded equivalence
    test uses (f32 iterative solve — the cross-process allreduce
    reassociates reductions)."""
    import numpy as np

    port = _free_port()
    worker = str(REPO / "scripts" / "mp_model_axis_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    outs = [os.path.join(tmpdir, f"ma_p{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker,
                "--process-id", str(i), "--num-processes", "2",
                "--port", str(port), "--out", outs[i],
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=timeout)[0].decode(errors="replace") for p in procs]
    if any(p.returncode != 0 for p in procs):
        raise RuntimeError(
            "model-axis worker failed:\n--- p0 ---\n" + logs[0]
            + "\n--- p1 ---\n" + logs[1]
        )

    ref_env = dict(env)
    ref_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    ref_out = os.path.join(tmpdir, "ma_ref.npz")
    ref = subprocess.run(
        [sys.executable, worker, "--num-processes", "1", "--out", ref_out],
        env=ref_env, capture_output=True, cwd=str(REPO), timeout=timeout,
    )
    if ref.returncode != 0:
        raise RuntimeError(
            "model-axis reference failed:\n" + ref.stderr.decode(errors="replace")
        )

    p0, p1, r = (np.load(o) for o in (outs[0], outs[1], ref_out))
    exact = {}
    for k in sorted(p0.files):
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=f"cross-process {k}")
        if k.startswith("als_"):
            np.testing.assert_allclose(
                p0[k], r[k], rtol=2e-4, atol=2e-5, err_msg=f"vs single-process {k}"
            )
            exact[k] = float(np.max(np.abs(p0[k] - r[k])))
        else:
            np.testing.assert_array_equal(
                p0[k], r[k], err_msg=f"vs single-process {k}"
            )
            exact[k] = 0.0
    return {
        "ok": True,
        "mode": "model-axis",
        "processes": 2,
        "devices": 8,
        "model_axis_size": 8,
        "results": sorted(p0.files),
        "max_abs_diff_vs_single_process": exact,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmp", default=None)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--model-axis", action="store_true",
                    help="run the model-axis collectives proof instead of "
                    "the data-parallel training run")
    args = ap.parse_args()
    fn = run_model_axis if args.model_axis else run
    kwargs = {} if args.model_axis else {"epochs": args.epochs}
    if args.tmp:
        os.makedirs(args.tmp, exist_ok=True)
        result = fn(args.tmp, **kwargs)
    else:
        with tempfile.TemporaryDirectory() as td:
            result = fn(td, **kwargs)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
