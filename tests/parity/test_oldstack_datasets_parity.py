"""Differential parity for the old-stack map-style dataset adapters
(replay_tpu/data/nn/torch_sequential_dataset.py,
replay_tpu/models/nn/sequential/{sasrec,bert4rec}.py) vs the reference's own
torch classes on identical inputs: per-sample query ids, padding masks,
feature windows, next-token shifts, masked-LM shifts, and validation
ground-truth/train padding must agree exactly.
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")

MAX_LEN = 5
N_ITEMS = 40


def _interactions():
    rng = np.random.default_rng(11)
    rows = []
    for u, n in enumerate([1, 3, 5, 6, 8, 12]):  # below, at, above MAX_LEN
        for t in range(n):
            rows.append((u, int(rng.integers(0, N_ITEMS)), t))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"])


def _reference_sequential(reference, df):
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn import (
        PandasSequentialDataset,
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorSchema,
    )

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            FeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            padding_value=0,
        )
    )
    grouped = (
        df.sort_values(["user_id", "timestamp"])
        .groupby("user_id")
        .agg({"item_id": list})
        .reset_index()
    )
    return PandasSequentialDataset(
        tensor_schema=schema,
        query_id_column="user_id",
        item_id_column="item_id",
        sequences=grouped,
    )


def _our_sequential(df):
    from replay_tpu.data.nn import (
        SequentialDataset,
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            padding_value=0,
        )
    )
    return SequentialDataset.from_interactions(
        schema, df, query_column="user_id", timestamp_column="timestamp"
    )


@pytest.mark.parametrize("step", [None, 2])
def test_torch_sequential_dataset_items_match(reference, step):
    df = _interactions()
    from replay.data.nn.torch_sequential_dataset import (
        TorchSequentialDataset as RefDS,
    )

    from replay_tpu.data.nn import TorchSequentialDataset as OurDS

    ref = RefDS(_reference_sequential(reference, df), MAX_LEN, sliding_window_step=step)
    ours = OurDS(_our_sequential(df), MAX_LEN, sliding_window_step=step)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r_qid, r_mask, r_feat = ref[i]
        o_qid, o_mask, o_feat = ours[i]
        assert int(r_qid.item()) == int(o_qid[0])
        np.testing.assert_array_equal(r_mask.numpy(), o_mask)
        np.testing.assert_array_equal(r_feat["item_id"].numpy(), o_feat["item_id"])


@pytest.mark.parametrize("step", [None, 2])
def test_sasrec_training_dataset_matches(reference, step):
    df = _interactions()
    from replay.models.nn.sequential.sasrec.dataset import (
        SasRecTrainingDataset as RefDS,
    )

    from replay_tpu.models.nn.sequential.sasrec import SasRecTrainingDataset as OurDS

    ref = RefDS(
        _reference_sequential(reference, df), MAX_LEN, sliding_window_step=step
    )
    ours = OurDS(_our_sequential(df), MAX_LEN, sliding_window_step=step)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert set(r.keys()) == set(o.keys())
        assert int(r["query_id"].item()) == int(o["query_id"][0])
        np.testing.assert_array_equal(r["padding_mask"].numpy(), o["padding_mask"])
        np.testing.assert_array_equal(
            r["feature_tensor"]["item_id"].numpy(), o["feature_tensor"]["item_id"]
        )
        np.testing.assert_array_equal(r["positive_labels"].numpy(), o["positive_labels"])
        np.testing.assert_array_equal(
            r["target_padding_mask"].numpy(), o["target_padding_mask"]
        )


def test_sasrec_prediction_dataset_matches(reference):
    df = _interactions()
    from replay.models.nn.sequential.sasrec.dataset import (
        SasRecPredictionDataset as RefDS,
    )

    from replay_tpu.models.nn.sequential.sasrec import SasRecPredictionDataset as OurDS

    ref = RefDS(_reference_sequential(reference, df), MAX_LEN)
    ours = OurDS(_our_sequential(df), MAX_LEN)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert int(r["query_id"].item()) == int(o["query_id"][0])
        np.testing.assert_array_equal(r["padding_mask"].numpy(), o["padding_mask"])
        np.testing.assert_array_equal(
            r["feature_tensor"]["item_id"].numpy(), o["feature_tensor"]["item_id"]
        )


def _split_for_validation(df):
    """Last 2 events per user -> ground truth; earlier -> sequential/train."""
    df = df.sort_values(["user_id", "timestamp"])
    gt = df.groupby("user_id").tail(2)
    tr = df.drop(gt.index)
    keep = np.intersect1d(tr["user_id"].unique(), gt["user_id"].unique())
    return tr[tr["user_id"].isin(keep)], gt[gt["user_id"].isin(keep)]


def test_sasrec_validation_dataset_matches(reference):
    df = _interactions()
    tr, gt = _split_for_validation(df)
    from replay.models.nn.sequential.sasrec.dataset import (
        SasRecValidationDataset as RefDS,
    )

    from replay_tpu.models.nn.sequential.sasrec import SasRecValidationDataset as OurDS

    ref = RefDS(
        _reference_sequential(reference, tr),
        _reference_sequential(reference, gt),
        _reference_sequential(reference, tr),
        MAX_LEN,
    )
    ours = OurDS(_our_sequential(tr), _our_sequential(gt), _our_sequential(tr), MAX_LEN)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert int(r["query_id"].item()) == int(o["query_id"][0])
        np.testing.assert_array_equal(r["padding_mask"].numpy(), o["padding_mask"])
        np.testing.assert_array_equal(
            r["feature_tensor"]["item_id"].numpy(), o["feature_tensor"]["item_id"]
        )
        np.testing.assert_array_equal(r["ground_truth"].numpy(), o["ground_truth"])
        np.testing.assert_array_equal(r["train"].numpy(), o["train"])


def test_bert4rec_prediction_dataset_matches(reference):
    """The masked-LM inference shift is deterministic — exact comparison."""
    df = _interactions()
    from replay.models.nn.sequential.bert4rec.dataset import (
        Bert4RecPredictionDataset as RefDS,
    )

    from replay_tpu.models.nn.sequential.bert4rec import (
        Bert4RecPredictionDataset as OurDS,
    )

    ref = RefDS(_reference_sequential(reference, df), MAX_LEN)
    ours = OurDS(_our_sequential(df), MAX_LEN)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert int(r["query_id"].item()) == int(o["query_id"][0])
        np.testing.assert_array_equal(r["pad_mask"].numpy(), o["pad_mask"])
        np.testing.assert_array_equal(r["token_mask"].numpy(), o["token_mask"])
        np.testing.assert_array_equal(r["inputs"]["item_id"].numpy(), o["inputs"]["item_id"])


def test_bert4rec_training_dataset_matches_except_mask(reference):
    """token_mask is a random draw (different RNGs) — compare the
    deterministic parts exactly and the mask's invariants."""
    df = _interactions()
    from replay.models.nn.sequential.bert4rec.dataset import (
        Bert4RecTrainingDataset as RefDS,
    )

    from replay_tpu.models.nn.sequential.bert4rec import (
        Bert4RecTrainingDataset as OurDS,
    )

    from replay_tpu.models.nn.sequential.bert4rec import Bert4RecUniformMasker

    ref = RefDS(_reference_sequential(reference, df), MAX_LEN)
    ours = OurDS(
        _our_sequential(df), MAX_LEN, masker=Bert4RecUniformMasker(rng=np.random.default_rng(3))
    )
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert int(r["query_id"].item()) == int(o["query_id"][0])
        np.testing.assert_array_equal(r["pad_mask"].numpy(), o["pad_mask"])
        np.testing.assert_array_equal(r["inputs"]["item_id"].numpy(), o["inputs"]["item_id"])
        np.testing.assert_array_equal(
            r["positive_labels"].numpy(), o["positive_labels"]
        )
        # mask invariants (reference dataset.py:72-92): not everything visible,
        # something visible (unless length-1 row). Padded positions are 0
        # EXCEPT the reference's all-masked rescue, which sets index -2
        # visible even when -2 is padding (a length-1 row whose only real
        # token got masked) — allow exactly that corner.
        tm = np.asarray(o["token_mask"])
        pad = np.asarray(o["pad_mask"]).astype(bool)
        assert not tm.all()
        if pad.sum() > 1:
            assert tm.any()
        leaked = np.flatnonzero(tm & ~pad)
        assert leaked.size == 0 or (
            leaked.tolist() == [len(tm) - 2] and not tm[pad].any()
        )


def test_bert4rec_uniform_masker_statistics(reference):
    """Same mask distribution as the reference masker on identical uniform
    draws: compare masked-fraction over many rows."""
    from replay.models.nn.sequential.bert4rec.dataset import (
        Bert4RecUniformMasker as RefMasker,
    )

    from replay_tpu.models.nn.sequential.bert4rec import (
        Bert4RecUniformMasker as OurMasker,
    )

    paddings = np.ones(64, dtype=bool)
    paddings[:16] = False
    ref_m = RefMasker(mask_prob=0.3, generator=torch.Generator().manual_seed(0))
    our_m = OurMasker(mask_prob=0.3, rng=np.random.default_rng(0))
    ref_frac = np.mean(
        [1 - ref_m.mask(torch.tensor(paddings)).numpy()[16:].mean() for _ in range(300)]
    )
    our_frac = np.mean([1 - our_m.mask(paddings)[16:].mean() for _ in range(300)])
    assert abs(ref_frac - our_frac) < 0.03
    # padded positions always masked-out on both sides
    assert not ref_m.mask(torch.tensor(paddings)).numpy()[:16].any()
    assert not our_m.mask(paddings)[:16].any()
