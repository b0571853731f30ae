"""Differential parity: replay_tpu losses vs the reference's torch losses
(replay/nn/loss/) on identical inputs.

Each reference loss gets a ``logits_callback`` that reproduces our tying
head (hidden @ item_weightsᵀ); both sides then see the same hidden states,
item table, labels, masks and (for sampled losses) the same negative ids,
so the scalars must match to float tolerance — including normalization
(CE: mean over valid positions; BCE: catalog-sum per valid position) and
collision masking.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")

B, L, D, N = 4, 6, 16, 30


@pytest.fixture()
def loss_inputs():
    rng = np.random.default_rng(21)
    hidden = rng.normal(size=(B, L, D)).astype(np.float32)
    weights = rng.normal(size=(N, D)).astype(np.float32) * 0.3
    labels = rng.integers(0, N, (B, L))
    lens = rng.integers(1, L + 1, B)
    mask = (np.arange(L)[None, :] >= (L - lens[:, None])).astype(np.int8)
    return hidden, weights, labels, mask


def _ref_args(hidden, labels, mask, negatives=None):
    t = torch.from_numpy
    return dict(
        model_embeddings=t(hidden),
        feature_tensors={},
        positive_labels=t(labels).long().unsqueeze(-1),
        negative_labels=None if negatives is None else t(negatives).long(),
        padding_mask=t(mask).bool(),
        target_padding_mask=t(mask).bool().unsqueeze(-1),
    )


def _with_head(ref_loss, weights):
    """Tying head matching the reference SasRec.get_logits contract: full
    catalog without ids; gathered per-id logits when ids are given
    (shared [n] or per-row [M, k])."""
    w = torch.from_numpy(weights)

    def callback(h, ids=None):
        if ids is None:
            return h @ w.T
        if ids.dim() == 1:
            return h @ w[ids].T
        return torch.einsum("md,mkd->mk", h, w[ids])

    ref_loss.logits_callback = callback
    return ref_loss


def test_ce_parity(reference, loss_inputs):
    from replay.nn.loss import CE

    from replay_tpu.nn.losses import CELoss

    hidden, weights, labels, mask = loss_inputs
    ref = _with_head(CE(), weights)(**_ref_args(hidden, labels, mask))
    ours = CELoss()(hidden, labels, mask, weights)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_full_parity(reference, loss_inputs):
    from replay.nn.loss import BCE

    from replay_tpu.nn.losses import BCELoss

    hidden, weights, labels, mask = loss_inputs
    ref = _with_head(BCE(), weights)(**_ref_args(hidden, labels, mask))
    ours = BCELoss()(hidden, labels, mask, weights)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_ce_sampled_parity(reference, loss_inputs):
    """Same shared negative vector on both sides (collisions included)."""
    from replay.nn.loss import CESampled

    from replay_tpu.nn.losses import CESampledLoss

    hidden, weights, labels, mask = loss_inputs
    rng = np.random.default_rng(3)
    negatives = rng.integers(0, N, 8)  # shared [n]; collides with labels
    assert np.isin(negatives, labels).any()

    ref = _with_head(CESampled(), weights)(
        **_ref_args(hidden, labels, mask, negatives=negatives)
    )
    ours = CESampledLoss()(hidden, labels, mask, weights, negatives=negatives)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_logince_full_catalog_parity(reference, loss_inputs):
    """Reference LogInCE/LogOutCE score against the full catalog with the
    positive masked out of the negatives — for single positives both equal
    CE; our aliases must match the reference modules."""
    from replay.nn.loss import LogInCE as RefLogInCE
    from replay.nn.loss import LogOutCE as RefLogOutCE

    from replay_tpu.nn.losses import LogInCE, LogOutCE

    hidden, weights, labels, mask = loss_inputs
    args = _ref_args(hidden, labels, mask)
    ref_in = _with_head(RefLogInCE(cardinality=N), weights)(**args)
    ref_out = _with_head(RefLogOutCE(cardinality=N), weights)(**args)
    ours_in = LogInCE(cardinality=N)(hidden, labels, mask, weights)
    ours_out = LogOutCE(cardinality=N)(hidden, labels, mask, weights)
    np.testing.assert_allclose(float(ours_in), float(ref_in), rtol=1e-4)
    np.testing.assert_allclose(float(ours_out), float(ref_out), rtol=1e-4)


def test_logince_sampled_parity(reference, loss_inputs):
    """Reference LogInCESampled with provided negatives == softmax-CE over
    [pos | negatives] for single positives (our LogOutCELoss)."""
    from replay.nn.loss import LogInCESampled as RefLogInCESampled

    from replay_tpu.nn.losses import LogInCESampled

    hidden, weights, labels, mask = loss_inputs
    rng = np.random.default_rng(9)
    negatives = rng.integers(0, N, 12)

    ref = _with_head(RefLogInCESampled(), weights)(
        **_ref_args(hidden, labels, mask, negatives=negatives)
    )
    ours = LogInCESampled()(hidden, labels, mask, weights, negatives=negatives)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_bce_sampled_parity(reference, loss_inputs):
    from replay.nn.loss import BCESampled

    from replay_tpu.nn.losses import BCESampledLoss

    hidden, weights, labels, mask = loss_inputs
    rng = np.random.default_rng(4)
    negatives = rng.integers(0, N, (B, L, 5))  # per-position negatives

    ref = _with_head(BCESampled(), weights)(
        **_ref_args(hidden, labels, mask, negatives=negatives)
    )
    ours = BCESampledLoss()(hidden, labels, mask, weights, negatives=negatives)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4, atol=1e-5)


def test_all_losses_accept_batch_negatives(reference, loss_inputs):
    """A reference-shaped pipeline attaches 'negatives' to every batch; the
    trainer forwards them to whatever loss is configured, so every loss must
    accept the kwarg (the reference's forward signatures all take
    negative_labels, ignored where unused)."""
    import jax

    from replay_tpu.nn import losses as L

    hidden, weights, labels, mask = loss_inputs
    negatives = np.arange(8)
    for loss in (
        L.CELoss(), L.CEWeightedLoss(), L.CESampledLoss(4),
        L.CESampledWeightedLoss(4), L.BCELoss(), L.BCESampledLoss(2),
        L.BPRLoss(2), L.LogInCELoss(), L.ScalableCELoss(),
        L.LogInCE(), L.LogOutCE(), L.LogInCESampled(), L.LogOutCESampled(),
        L.LogOutCELoss(),
    ):
        val = loss(hidden, labels, mask, weights, negatives=negatives,
                   key=jax.random.PRNGKey(0))
        assert np.isfinite(float(val)), type(loss).__name__


def test_ce_sampled_weighted_uses_batch_negatives(reference, loss_inputs):
    """CESampledWeighted must consume batch-provided negatives on both the
    weighted and unweighted code paths (not silently redraw its own)."""
    import jax

    from replay_tpu.nn.losses import CESampledLoss, CESampledWeightedLoss

    hidden, weights, labels, mask = loss_inputs
    negatives = np.arange(8)
    sw = np.ones_like(mask, dtype=np.float32)
    base = CESampledLoss(4)(hidden, labels, mask, weights, negatives=negatives)
    weighted = CESampledWeightedLoss(4)(
        hidden, labels, mask, weights, negatives=negatives, sample_weights=sw,
        key=jax.random.PRNGKey(0),
    )
    # unit weights + same negatives -> identical value, proving the negatives
    # flow through the weighted path
    np.testing.assert_allclose(float(weighted), float(base), rtol=1e-6)
