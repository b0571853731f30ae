"""Wait for the axon TPU tunnel to come back, then run the pending
measurement suites (scripts/tpu_measure.py) one after another.

The tunnel flaps: it was alive for ~15 min on 2026-08-18 (long enough for
one bench.py run) and went down again.  This watcher probes in a SUBPROCESS
(a hung tunnel blocks inside C code; in-process timeouts never fire) every
probe_interval seconds and, on the first success, immediately launches the
suites so a short up-window is not wasted.

Usage:  python scripts/tpu_watch.py [suite ...]   (default: step_losses topk ce)
Results append to /tmp/tpu_watch_results.log.
"""

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RESULTS = Path("/tmp/tpu_watch_results.log")

PROBE = "import jax; print(jax.default_backend()); print(float(jax.numpy.ones(())+1))"


def tunnel_alive(timeout_s: int = 150) -> bool:
    try:
        probe = subprocess.run(
            [sys.executable, "-c", PROBE],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return probe.returncode == 0 and "tpu" in probe.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    suites = sys.argv[1:] or ["step_losses", "topk", "ce"]
    probe_interval = 120
    with RESULTS.open("a") as log:
        log.write(f"\n=== tpu_watch start {time.strftime('%F %T')} suites={suites}\n")
        log.flush()
        while True:
            if tunnel_alive():
                log.write(f"--- tunnel alive at {time.strftime('%F %T')}\n")
                log.flush()
                for suite in suites:
                    t0 = time.time()
                    try:
                        run = subprocess.run(
                            [sys.executable, "scripts/tpu_measure.py",
                             "--only", suite],
                            cwd=REPO, capture_output=True, text=True,
                            timeout=3600,
                        )
                        out = run.stdout + ("\n[stderr tail]\n" + run.stderr[-2000:]
                                            if run.returncode else "")
                    except subprocess.TimeoutExpired as exc:
                        out = f"TIMEOUT after {exc.timeout}s\n" + (
                            (exc.stdout or b"").decode() if exc.stdout else "")
                    log.write(f"--- suite {suite} ({time.time()-t0:.0f}s)\n{out}\n")
                    log.flush()
                    # a suite crash may mean the tunnel died mid-run: re-probe
                    if not tunnel_alive():
                        log.write("--- tunnel lost; resuming watch\n")
                        log.flush()
                        break
                else:
                    log.write(f"=== all suites done {time.strftime('%F %T')}\n")
                    return
            time.sleep(probe_interval)


if __name__ == "__main__":
    main()
