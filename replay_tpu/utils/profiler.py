"""First-class TPU trace capture.

The reference has no dedicated tracer (SURVEY.md §5.1 — Lightning progress
bars and notebook %%timeit only); the TPU build gets jax.profiler as a
first-class utility: traces land in a directory consumable by
TensorBoard/XProf/Perfetto, and a lightweight step timer summarizes
wall-clock per named section.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for everything inside the block.

    >>> # with trace("/tmp/jax-trace"):
    >>> #     state, _ = train_step(state, batch, key)
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side wall-clock accumulator per named section.

    Blocks on device completion at section exit so the measured time is the
    real device time, not dispatch time.
    """

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._totals[name] += time.perf_counter() - start
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self._totals[name],
                "count": self._counts[name],
                "mean_ms": 1000.0 * self._totals[name] / max(self._counts[name], 1),
            }
            for name in self._totals
        }

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()
