"""Differential parity: replay_tpu batch transforms vs the reference's
torch transforms (replay/nn/transform/*) on identical random batches.

Deterministic transforms must match elementwise (after the documented
naming adaptations — our pipeline uses ``padding_mask``/``labels``, the
reference uses ``{col}_mask``/``positive_labels``).  Randomized transforms
(token masking) are compared on their statistics and invariants, since the
two RNGs (torch vs threefry) cannot match bitwise.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")


@pytest.fixture()
def seq_batch():
    rng = np.random.default_rng(11)
    b, length = 8, 12
    items = rng.integers(0, 50, (b, length)).astype(np.int64)
    lens = rng.integers(1, length + 1, b)
    pad = (np.arange(length)[None, :] >= (length - lens[:, None])).astype(np.int8)
    items = np.where(pad == 1, items, 0)
    return {"items": items, "pad": pad}


def test_next_token_parity(reference, seq_batch):
    from replay.nn.transform import NextTokenTransform as RefNextToken

    from replay_tpu.nn.transforms import NextTokenTransform

    ref_batch = {
        "item_id": torch.from_numpy(seq_batch["items"]),
        "item_id_mask": torch.from_numpy(seq_batch["pad"]).bool(),
    }
    ref_out = RefNextToken(label_name="item_id", shift=1, mask_postfix="_mask")(ref_batch)

    our_batch = {
        "item_id": jnp.asarray(seq_batch["items"]),
        "padding_mask": jnp.asarray(seq_batch["pad"]),
    }
    out = NextTokenTransform()(our_batch)

    np.testing.assert_array_equal(np.asarray(out["item_id"]), ref_out["item_id"].numpy())
    np.testing.assert_array_equal(np.asarray(out["labels"]), ref_out["positive_labels"].numpy())
    np.testing.assert_array_equal(
        np.asarray(out["padding_mask"]).astype(bool),
        ref_out["item_id_mask"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(out["labels_padding_mask"]).astype(bool),
        ref_out["positive_labels_mask"].numpy(),
    )


def test_trim_parity(reference, seq_batch):
    from replay.nn.transform import TrimTransform as RefTrim

    from replay_tpu.nn.transforms import TrimTransform

    ref_out = RefTrim(seq_len=5, feature_names="item_id")(
        {"item_id": torch.from_numpy(seq_batch["items"])}
    )
    out = TrimTransform(seq_len=5, apply_to=["item_id"])(
        {"item_id": jnp.asarray(seq_batch["items"])}
    )
    np.testing.assert_array_equal(np.asarray(out["item_id"]), ref_out["item_id"].numpy())


def test_adaptive_trim_parity(reference, seq_batch):
    from replay.nn.transform import AdaptiveTrimTransform as RefAdaptiveTrim

    from replay_tpu.nn.transforms import AdaptiveTrimTransform

    ref_out = RefAdaptiveTrim("item_id", padding_mask_name="padding_mask")(
        {
            "item_id": torch.from_numpy(seq_batch["items"]),
            "padding_mask": torch.from_numpy(seq_batch["pad"]).bool(),
        }
    )
    out = AdaptiveTrimTransform(apply_to=["item_id"])(
        {
            "item_id": jnp.asarray(seq_batch["items"]),
            "padding_mask": jnp.asarray(seq_batch["pad"]),
        }
    )
    np.testing.assert_array_equal(np.asarray(out["item_id"]), ref_out["item_id"].numpy())
    np.testing.assert_array_equal(
        np.asarray(out["padding_mask"]).astype(bool), ref_out["padding_mask"].numpy()
    )


@pytest.mark.parametrize("roll", [-1, 1, 2, -3])
def test_sequence_roll_parity(reference, seq_batch, roll):
    from replay.nn.transform import SequenceRollTransform as RefRoll

    from replay_tpu.nn.transforms import SequenceRollTransform

    ref_out = RefRoll("item_id", roll=roll, padding_value=99)(
        {"item_id": torch.from_numpy(seq_batch["items"].copy())}
    )
    out = SequenceRollTransform(shift=roll, apply_to=["item_id"], padding_value=99)(
        {"item_id": jnp.asarray(seq_batch["items"])}
    )
    np.testing.assert_array_equal(np.asarray(out["item_id"]), ref_out["item_id"].numpy())


@pytest.mark.parametrize("mode", ["and", "or", "xor"])
def test_equality_mask_parity(reference, seq_batch, mode):
    from replay.nn.transform import EqualityMaskTransform as RefEq

    from replay_tpu.nn.transforms import EqualityMaskTransform

    events = np.random.default_rng(5).integers(0, 4, seq_batch["items"].shape)
    ref_out = RefEq("events_type", equality_value=2, mode=mode)(
        {
            "target_padding_mask": torch.from_numpy(seq_batch["pad"]).bool(),
            "events_type": torch.from_numpy(events),
        }
    )
    out = EqualityMaskTransform(
        "events_type", equality_value=2, mode=mode, mask_name="target_padding_mask"
    )(
        {
            "target_padding_mask": jnp.asarray(seq_batch["pad"]).astype(bool),
            "events_type": jnp.asarray(events),
        }
    )
    np.testing.assert_array_equal(
        np.asarray(out["target_padding_mask"]), ref_out["target_padding_mask"].numpy()
    )


def test_uniform_negative_sampling_invariants(reference):
    """Reference draws one shared negatives vector per batch WITHOUT
    replacement (torch.multinomial(ones, replacement=False)); ours must be
    distinct too, respect zero weights, and cover the catalog uniformly."""
    import jax

    from replay_tpu.nn.transforms import UniformNegativeSamplingTransform

    t = UniformNegativeSamplingTransform(n_negatives=20, n_items=40)
    counts = np.zeros(40)
    for i in range(200):
        out = t({}, key=jax.random.PRNGKey(i))
        negs = np.asarray(out["negatives"])
        assert len(set(negs.tolist())) == 20  # without replacement
        counts[negs] += 1
    # uniform coverage: every item drawn, frequencies within 4 sigma
    p = 0.5
    sigma = np.sqrt(200 * p * (1 - p))
    assert (np.abs(counts - 100) < 4 * sigma).all(), counts

    weights = np.zeros(40)
    weights[:25] = 1.0
    t = UniformNegativeSamplingTransform(
        n_negatives=20, n_items=40, sample_distribution=weights
    )
    out = t({}, key=jax.random.PRNGKey(0))
    assert np.asarray(out["negatives"]).max() < 25  # zero-weight never drawn


def test_token_mask_statistics(reference, seq_batch):
    """Randomized masking: both implementations must (a) mask only real
    tokens, (b) select ~mask_prob of them, (c) leave no row unmasked."""
    import jax

    from replay_tpu.nn.transforms import TokenMaskTransform

    pad = np.tile(seq_batch["pad"], (64, 1))
    batch = {"padding_mask": jnp.asarray(pad)}
    out = TokenMaskTransform(mask_prob=0.3)(batch, key=jax.random.PRNGKey(0))
    tm = np.asarray(out["token_mask"])
    assert ((tm == 1) & (pad == 0)).sum() == 0  # padding never selected
    frac = tm.sum() / pad.sum()
    assert 0.25 < frac < 0.36, frac
    assert (tm.sum(axis=1) >= 1).all()  # every row trains


def _run_pair(ref_t, mine_t, batch):
    """Apply a reference torch transform and ours to the same batch dict,
    compare every output key elementwise."""
    ref_in = {k: torch.as_tensor(np.asarray(v).copy()) for k, v in batch.items()}
    ref_out = ref_t(ref_in)
    mine_out = mine_t({k: jnp.asarray(v) for k, v in batch.items()})

    def flatten(d, prefix=""):
        flat = {}
        for k, v in d.items():
            if isinstance(v, dict):
                flat.update(flatten(v, prefix + k + "/"))
            else:
                flat[prefix + k] = np.asarray(v)
        return flat

    ref_f, mine_f = flatten(ref_out), flatten(mine_out)
    assert set(ref_f) == set(mine_f), (sorted(ref_f), sorted(mine_f))
    for k in ref_f:
        np.testing.assert_array_equal(mine_f[k], ref_f[k], err_msg=k)


def test_rename_parity(reference, seq_batch):
    from replay.nn.transform import RenameTransform as Ref

    from replay_tpu.nn.transforms import RenameTransform

    _run_pair(Ref({"items": "input_ids", "pad": "padding_mask"}),
              RenameTransform({"items": "input_ids", "pad": "padding_mask"}),
              seq_batch)


def test_copy_parity(reference, seq_batch):
    from replay.nn.transform import CopyTransform as Ref

    from replay_tpu.nn.transforms import CopyTransform

    _run_pair(Ref({"items": "items_copy"}),
              CopyTransform({"items": "items_copy"}), seq_batch)


def test_unsqueeze_parity(reference, seq_batch):
    from replay.nn.transform import UnsqueezeTransform as Ref

    from replay_tpu.nn.transforms import UnsqueezeTransform

    _run_pair(Ref("items", -1), UnsqueezeTransform("items", -1), seq_batch)


def test_group_parity(reference, seq_batch):
    from replay.nn.transform import GroupTransform as Ref

    from replay_tpu.nn.transforms import GroupTransform

    _run_pair(Ref({"feature_tensors": ["items"]}),
              GroupTransform({"feature_tensors": ["items"]}), seq_batch)


def test_select_parity(reference, seq_batch):
    from replay.nn.transform import SelectTransform as Ref

    from replay_tpu.nn.transforms import SelectTransform

    _run_pair(Ref(["items"]), SelectTransform(["items"]), seq_batch)
