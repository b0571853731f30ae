"""Differential parity: replay_tpu MetricsBuilder vs the reference's
TorchMetricsBuilder on identical prediction/ground-truth/train batches.

Both builders accumulate over multiple batches; per-metric means at every k
must match to float tolerance (same hit matrices, same ndcg/map weighting,
same coverage = |recs ∩ train items| / |train items|).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")

N_ITEMS = 40
K_MAX = 10


def _make_batch(rng, b):
    preds = np.stack([rng.permutation(N_ITEMS)[:K_MAX] for _ in range(b)])
    gt = np.full((b, 6), -1, dtype=np.int64)
    for i in range(b):
        n_gt = rng.integers(1, 7)
        gt[i, :n_gt] = rng.choice(N_ITEMS, n_gt, replace=False)
    train = np.full((b, 8), -2, dtype=np.int64)
    for i in range(b):
        n_tr = rng.integers(1, 9)
        train[i, :n_tr] = rng.choice(N_ITEMS, n_tr, replace=False)
    return preds, gt, train


def test_builder_matches_reference(reference):
    from replay.metrics.torch_metrics_builder import TorchMetricsBuilder

    from replay_tpu.metrics import MetricsBuilder

    metrics = ["map", "ndcg", "recall", "precision", "mrr", "novelty", "coverage"]
    ks = [1, 5, 10]
    ref = TorchMetricsBuilder(metrics=metrics, top_k=ks, item_count=N_ITEMS)
    ours = MetricsBuilder(metrics=metrics, ks=ks, item_count=N_ITEMS)

    rng = np.random.default_rng(13)
    for b in (7, 5, 9):
        preds, gt, train = _make_batch(rng, b)
        ref.add_prediction(
            torch.from_numpy(preds), torch.from_numpy(gt), torch.from_numpy(train)
        )
        ours.add_prediction(preds, gt, train)

    ref_vals = ref.get_metrics()
    our_vals = ours.get_metrics()
    for name, ref_v in ref_vals.items():
        assert name in our_vals, f"missing {name}"
        np.testing.assert_allclose(
            our_vals[name], ref_v, rtol=1e-6, atol=1e-9, err_msg=name
        )
