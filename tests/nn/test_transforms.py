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
    out = UniformNegativeSamplingTransform(16, n_items=7)(make_batch(), key=jax.random.PRNGKey(1))
    negs = np.asarray(out["negatives"])
    assert negs.shape == (16,)
    assert negs.min() >= 0 and negs.max() < 7


def test_trim_and_roll():
    out = TrimTransform(2)(make_batch())
    np.testing.assert_array_equal(out["item_id"], [[2, 3], [4, 5]])
    rolled = SequenceRollTransform(-1, apply_to=["item_id"])(make_batch())
    np.testing.assert_array_equal(rolled["item_id"][0], [1, 2, 3, 9])


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
