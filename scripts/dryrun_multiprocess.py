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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmp", default=None)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()
    if args.tmp:
        os.makedirs(args.tmp, exist_ok=True)
        result = run(args.tmp, epochs=args.epochs)
    else:
        with tempfile.TemporaryDirectory() as td:
            result = run(td, epochs=args.epochs)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
