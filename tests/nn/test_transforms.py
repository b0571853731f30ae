"""Batch transform tests."""

import pytest
import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.nn.transforms import (
    AdaptiveTrimTransform,
    Compose,
    EqualityMaskTransform,
    MultiClassNegativeSamplingTransform,
    CopyTransform,
    NextTokenTransform,
    RenameTransform,
    SelectTransform,
    SequenceRollTransform,
    TokenMaskTransform,
    TrimTransform,
    UniformNegativeSamplingTransform,
)


def make_batch():
    return {
        "item_id": jnp.asarray([[9, 1, 2, 3], [9, 9, 4, 5]], dtype=jnp.int32),
        "padding_mask": jnp.asarray([[0, 1, 1, 1], [0, 0, 1, 1]], dtype=jnp.int8),
        "batch_mask": jnp.asarray([1, 1], dtype=jnp.int8),
        "query_id": jnp.asarray([10, 11]),
    }


def test_next_token():
    out = NextTokenTransform()(make_batch())
    np.testing.assert_array_equal(out["item_id"], [[9, 1, 2], [9, 9, 4]])
    np.testing.assert_array_equal(out["labels"], [[1, 2, 3], [9, 4, 5]])
    np.testing.assert_array_equal(out["labels_padding_mask"], [[1, 1, 1], [0, 1, 1]])
    np.testing.assert_array_equal(out["padding_mask"], [[0, 1, 1], [0, 0, 1]])
    # 1-D fields untouched
    np.testing.assert_array_equal(out["query_id"], [10, 11])


def test_token_mask_only_on_real_tokens():
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    out = TokenMaskTransform(mask_prob=0.5)(batch, key=key)
    tm = np.asarray(out["token_mask"])
    pad = np.asarray(batch["padding_mask"])
    assert np.all(tm <= pad)  # never masks padding
    assert np.all(tm.sum(axis=1) >= 1)  # at least one target per row


def test_negative_sampling_range():
    out = UniformNegativeSamplingTransform(5, n_items=7)(make_batch(), key=jax.random.PRNGKey(1))
    negs = np.asarray(out["negatives"])
    assert negs.shape == (5,)
    assert negs.min() >= 0 and negs.max() < 7
    assert len(set(negs.tolist())) == 5  # without replacement by default
    # reference rejects n_negatives >= cardinality (negative_sampling.py:52)
    with pytest.raises(ValueError):
        UniformNegativeSamplingTransform(16, n_items=7)
    # with-replacement mode allows over-catalog draws
    out = UniformNegativeSamplingTransform(16, n_items=7, replacement=True)(
        make_batch(), key=jax.random.PRNGKey(1)
    )
    assert np.asarray(out["negatives"]).shape == (16,)
    # replacement=True honors the distribution (categorical draw), including
    # fewer positive-weight items than samples
    w = np.zeros(7)
    w[:3] = 1.0
    out = UniformNegativeSamplingTransform(
        16, n_items=7, sample_distribution=w, replacement=True
    )(make_batch(), key=jax.random.PRNGKey(2))
    negs = np.asarray(out["negatives"])
    assert negs.shape == (16,) and negs.max() < 3


def test_trim_and_roll():
    out = TrimTransform(2)(make_batch())
    np.testing.assert_array_equal(out["item_id"], [[2, 3], [4, 5]])
    # vacated positions take padding_value, not the wrapped element
    # (reference: replay/nn/transform/sequence_roll.py overwrites them)
    rolled = SequenceRollTransform(-1, apply_to=["item_id"])(make_batch())
    np.testing.assert_array_equal(rolled["item_id"][0], [1, 2, 3, 0])
    rolled = SequenceRollTransform(-1, apply_to=["item_id"], padding_value=7)(make_batch())
    np.testing.assert_array_equal(rolled["item_id"][0], [1, 2, 3, 7])
    rolled = SequenceRollTransform(2, apply_to=["item_id"], padding_value=7)(make_batch())
    np.testing.assert_array_equal(rolled["item_id"][0], [7, 7, 9, 1])


def test_rename_copy_select_compose():
    pipeline = Compose(
        [
            CopyTransform({"item_id": "raw"}),
            RenameTransform({"query_id": "user"}),
            SelectTransform(["raw", "user", "item_id", "padding_mask", "batch_mask"]),
        ]
    )
    out = pipeline(make_batch(), key=jax.random.PRNGKey(0))
    assert set(out) == {"raw", "user", "item_id", "padding_mask", "batch_mask"}


def test_unsqueeze_and_group():
    from replay_tpu.nn.transforms import GroupTransform, UnsqueezeTransform

    batch = make_batch()
    out = UnsqueezeTransform("query_id")(batch)
    assert out["query_id"].shape == (2, 1)
    grouped = GroupTransform({"feature_tensors": ["item_id", "padding_mask"]})(batch)
    assert set(grouped["feature_tensors"]) == {"item_id", "padding_mask"}
    np.testing.assert_array_equal(grouped["feature_tensors"]["item_id"], batch["item_id"])


class TestNewTransforms:
    def test_equality_mask_modes(self):
        batch = {
            "labels_padding_mask": jnp.asarray([[0, 1, 1, 1, 1]], dtype=jnp.int8),
            "events_type": jnp.asarray([[0, 3, 2, 1, 2]]),
        }
        out = EqualityMaskTransform("events_type", 2, mode="and")(batch)
        np.testing.assert_array_equal(out["labels_padding_mask"][0], [0, 0, 1, 0, 1])
        out = EqualityMaskTransform("events_type", 2, mode="or")(batch)
        np.testing.assert_array_equal(out["labels_padding_mask"][0], [0, 1, 1, 1, 1])
        out = EqualityMaskTransform("events_type", 2, mode="xor")(batch)
        np.testing.assert_array_equal(out["labels_padding_mask"][0], [0, 1, 0, 1, 0])
        with pytest.raises(ValueError):
            EqualityMaskTransform("events_type", 2, mode="nand")

    def test_adaptive_trim(self):
        batch = {
            "item_id": jnp.asarray([[5, 5, 5, 5, 0], [5, 5, 0, 2, 4]]),
            "padding_mask": jnp.asarray([[0, 0, 0, 0, 1], [0, 0, 1, 1, 1]], dtype=jnp.int8),
            "batch_mask": jnp.asarray([1, 1], dtype=jnp.int8),
        }
        out = AdaptiveTrimTransform()(batch)
        assert out["item_id"].shape == (2, 3)
        np.testing.assert_array_equal(out["item_id"], [[5, 5, 0], [0, 2, 4]])
        np.testing.assert_array_equal(out["padding_mask"], [[0, 0, 1], [1, 1, 1]])
        # no padding to remove → unchanged object
        full = {
            "item_id": jnp.asarray([[1, 2]]),
            "padding_mask": jnp.asarray([[1, 1]], dtype=jnp.int8),
        }
        assert AdaptiveTrimTransform()(full) is full

    def test_multiclass_negative_sampling(self):
        sample_mask = jnp.asarray(
            [
                [1, 0, 1, 0, 0, 0],
                [0, 0, 0, 1, 1, 0],
                [0, 1, 0, 0, 0, 1],
            ],
            dtype=jnp.float32,
        )
        batch = {"negative_selector": jnp.asarray([0, 2, 1, 1, 0])}
        t = MultiClassNegativeSamplingTransform(2, sample_mask)
        out = t(batch, key=jax.random.PRNGKey(0))
        negs = np.asarray(out["negative_labels"])
        assert negs.shape == (5, 2)
        allowed = {0: {0, 2}, 1: {3, 4}, 2: {1, 5}}
        for row, cls in enumerate([0, 2, 1, 1, 0]):
            assert set(negs[row]) <= allowed[cls], (row, negs[row])
            assert len(set(negs[row])) == 2  # without replacement
        with pytest.raises(ValueError):
            MultiClassNegativeSamplingTransform(6, sample_mask)
        with pytest.raises(ValueError):
            MultiClassNegativeSamplingTransform(2, jnp.ones((4,)))

    def test_weighted_uniform_negative_sampling(self):
        # weight concentrated on items 0..4 → samples stay there
        w = np.zeros(20, np.float32)
        w[:5] = 1.0
        t = UniformNegativeSamplingTransform(3, 20, sample_distribution=w)
        out = t({}, key=jax.random.PRNGKey(1))
        negs = np.asarray(out["negatives"])
        assert negs.shape == (3,)
        assert set(negs) <= set(range(5)) and len(set(negs)) == 3
        with pytest.raises(ValueError):
            UniformNegativeSamplingTransform(3, 21, sample_distribution=w)


def test_negative_sampling_rejects_short_classes():
    """Zero-weight items must never leak out of the without-replacement
    sampler (round-2 review finding: -inf survives top_k when a class has
    fewer eligible items than requested samples)."""
    short_mask = jnp.asarray([[1.0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]])
    with pytest.raises(ValueError, match="positive-weight"):
        MultiClassNegativeSamplingTransform(4, short_mask)
    w = np.zeros(20, np.float32)
    w[:2] = 1.0
    with pytest.raises(ValueError, match="positive-weight"):
        UniformNegativeSamplingTransform(3, 20, sample_distribution=w)


# --------------------------------------------- immutability + validation
# (reference surface: tests/nn/transform/test_transform.py:358-414
# immutability sweep and the *_raises cases)


def _snapshot(batch):
    return {k: np.array(v) for k, v in batch.items()}


def _assert_unchanged(batch, before):
    assert set(batch.keys()) == set(before.keys())
    for k, v in before.items():
        np.testing.assert_array_equal(np.asarray(batch[k]), v, err_msg=k)


@pytest.mark.parametrize(
    "transform,needs_key",
    [
        (NextTokenTransform(), False),
        (TokenMaskTransform(mask_prob=0.5), True),
        (UniformNegativeSamplingTransform(n_negatives=3, n_items=10), True),
        (TrimTransform(seq_len=2), False),
        (SequenceRollTransform(shift=-1), False),
        (RenameTransform({"item_id": "ids"}), False),
        (CopyTransform({"item_id": "copy"}), False),
        (SelectTransform(["item_id"]), False),
        (EqualityMaskTransform("item_id", 9, mode="and", mask_name="padding_mask"), False),
        (AdaptiveTrimTransform(), False),
    ],
    ids=lambda t: type(t).__name__ if not isinstance(t, bool) else str(t),
)
def test_transform_does_not_mutate_input(transform, needs_key):
    batch = make_batch()
    before = _snapshot(batch)
    key = jax.random.PRNGKey(0) if needs_key else None
    transform(batch, key=key)
    _assert_unchanged(batch, before)


def test_uniform_negative_sampling_distribution_size_mismatch():
    with pytest.raises(ValueError, match="expected 10"):
        UniformNegativeSamplingTransform(
            n_negatives=2, n_items=10, sample_distribution=np.ones(5)
        )


def test_uniform_negative_sampling_insufficient_support():
    dist = np.zeros(10)
    dist[:2] = 1.0
    with pytest.raises(ValueError, match="positive-weight"):
        UniformNegativeSamplingTransform(
            n_negatives=5, n_items=10, sample_distribution=dist
        )


def test_multiclass_sampling_validations():
    with pytest.raises(ValueError, match="n_classes, n_items"):
        MultiClassNegativeSamplingTransform(2, np.ones(6))
    with pytest.raises(ValueError, match="less than"):
        MultiClassNegativeSamplingTransform(6, np.ones((2, 6)))
    short = np.ones((2, 6))
    short[1, 2:] = 0.0
    with pytest.raises(ValueError, match="class 1"):
        MultiClassNegativeSamplingTransform(3, short)


def test_equality_mask_bad_mode():
    with pytest.raises(ValueError, match="Mode"):
        EqualityMaskTransform("item_id", 1, mode="nand")


def test_adaptive_trim_missing_mask_raises():
    with pytest.raises(KeyError, match="padding_mask"):
        AdaptiveTrimTransform()({"item_id": jnp.ones((2, 3))})


def test_compose_splits_keys_deterministically():
    t = Compose([
        TokenMaskTransform(mask_prob=0.5),
        UniformNegativeSamplingTransform(n_negatives=4, n_items=50),
    ])
    key = jax.random.PRNGKey(7)
    a = t(make_batch(), key=key)
    b = t(make_batch(), key=key)
    np.testing.assert_array_equal(a["token_mask"], b["token_mask"])
    np.testing.assert_array_equal(a["negatives"], b["negatives"])
    # the two stages must not share a key stream
    c = t(make_batch(), key=jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(a["negatives"]), np.asarray(c["negatives"]))


def test_token_mask_every_row_trains():
    """mask_prob→0 still yields ≥1 masked position per row (the forced
    last-real-token rule, reference Bert4RecUniformMasker contract)."""
    t = TokenMaskTransform(mask_prob=1e-9)
    out = t(make_batch(), key=jax.random.PRNGKey(0))
    tm = np.asarray(out["token_mask"])
    assert (tm.sum(axis=1) >= 1).all()
    np.testing.assert_array_equal(tm, [[0, 0, 0, 1], [0, 0, 0, 1]])


def test_trim_keeps_most_recent():
    out = TrimTransform(seq_len=2)(make_batch())
    np.testing.assert_array_equal(out["item_id"], [[2, 3], [4, 5]])
    np.testing.assert_array_equal(out["padding_mask"], [[1, 1], [1, 1]])


def test_adaptive_trim_bucketing():
    from replay_tpu.nn.transforms import AdaptiveTrimTransform

    batch = {
        "item_id": jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16),
        "padding_mask": jnp.asarray(
            [[0] * 11 + [1] * 5, [0] * 13 + [1] * 3], dtype=jnp.int8
        ),
    }
    exact = AdaptiveTrimTransform()(batch)
    assert exact["item_id"].shape[1] == 5
    # bucketed: 5 -> 8 (next power of two), bounding recompiles
    bucketed = AdaptiveTrimTransform(bucket=True)(batch)
    assert bucketed["item_id"].shape[1] == 8
    np.testing.assert_array_equal(
        np.asarray(bucketed["item_id"])[:, -5:], np.asarray(exact["item_id"])
    )
