"""MODEL-AXIS collectives across a REAL process boundary (round-4 verdict
item 2): a 2-process × 4-devices-each mesh whose ``model`` axis spans both
processes runs the cross-rank schedules the reference delegates to
torch.distributed/Lightning (reference:
replay/data/nn/parquet/info/replicas.py:7-68, SURVEY.md §2.8):

- ``a2a_sharded_lookup`` forward AND backward (duplicate ids in the batch —
  the cotangent scatter-adds into the owner process's shards),
- the forced-overflow certificate → exact psum fallback (skewed batch),
- ``distributed_topk``,
- one ``ALSWrap(mesh=...)`` solve.

Collectives must come back BITWISE equal to the single-process 8-device
run; ALS factors are held to the in-process sharded-vs-unsharded tolerance
(rtol 2e-4 / atol 2e-5 — f32 iterative solve, cross-process allreduce
reassociates reductions).  Spawn/compare logic lives in
scripts/dryrun_multiprocess.py::run_model_axis.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent / "scripts"))

pytestmark = pytest.mark.slow


def test_model_axis_collectives_across_processes(tmp_path):
    import dryrun_multiprocess

    result = dryrun_multiprocess.run_model_axis(str(tmp_path))
    assert result["ok"]
    assert result["model_axis_size"] == 8
    # every schedule ran: forward, backward, overflow-fallback, topk, ALS
    for key in (
        "a2a_fwd", "a2a_grad", "a2a_overflow_fwd", "a2a_overflow_grad",
        "topk_vals", "topk_idx", "als_query_factors", "als_item_factors",
    ):
        assert key in result["results"], key
    # the collective schedules are bitwise-equal across the process boundary
    for key, diff in result["max_abs_diff_vs_single_process"].items():
        if not key.startswith("als_"):
            assert diff == 0.0, (key, diff)
