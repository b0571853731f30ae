"""Ranking losses for sequential recommenders.

TPU-native analog of the reference loss zoo (reference: replay/nn/loss/ —
BCE/BCESampled bce.py:10,98; CE/CESampled ce.py:10,146; LogInCE
login_ce.py:102; LogOutCE logout_ce.py:10; SCE
replay/models/nn/loss/sce.py:27, arXiv 2409.18721).

Contract: every loss is a callable of

    loss(hidden, labels, mask, item_weights, *, key=None)

where ``hidden`` is [B, L, D] model output, ``labels`` [B, L] int32 target
item ids, ``mask`` [B, L] {0,1} valid-position mask, and ``item_weights``
[N, D] the item embedding table (the tying-head weights — the functional
equivalent of the reference's ``logits_callback`` wiring, ce.py:26-47).
All return a float32 scalar (mean over valid positions).

TPU notes: logits always accumulate in float32 (``preferred_element_type``);
sampled losses draw a *shared* negative set per step — one gather of
[n_neg, D] rows instead of [B, L, n_neg] gathers, which keeps the negative
GEMM dense on the MXU and is statistically equivalent for uniform sampling.
"""

from dataclasses import dataclass
from typing import Optional, Protocol

import jax
import jax.numpy as jnp

from replay_tpu.nn.head import tying_logits


NEG = jnp.float32(-1e9)


def _masked_mean(per_pos: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(jnp.float32)
    return jnp.sum(jnp.where(mask > 0, per_pos, 0.0)) / jnp.maximum(jnp.sum(mask), 1.0)


def _safe_labels(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace padded-position labels (which hold the out-of-range padding
    id) with 0 — those positions are zero-masked in the loss, but an
    out-of-bounds ``take`` fills NaN which would poison the masked sum."""
    return jnp.where(mask > 0, labels, 0)


class CELoss:
    """Full-softmax cross-entropy over the catalog (reference: replay/nn/loss/ce.py:10)."""

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        # ``negatives`` is accepted and ignored, as the reference CE.forward
        # accepts negative_labels (ce.py:54, ARG002) — pipelines that attach
        # a negative-sampling transform can still use full-softmax losses
        labels = _safe_labels(labels, mask)
        logits = tying_logits(hidden, item_weights)  # [B, L, N] f32
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return _masked_mean(nll, mask)


class CESampledLoss:
    """Sampled-softmax CE (reference: replay/nn/loss/ce.py:146).

    Scores the positive against ``n_negatives`` uniform catalog samples.
    Accidental hits (negative == label) are masked to -inf, matching the
    reference's collision handling.  Pass ``negatives`` (a shared [n] id
    vector, e.g. from UniformNegativeSamplingTransform) to use
    batch-provided negatives as the reference does.
    """

    def __init__(self, n_negatives: int = 256):
        self.n_negatives = n_negatives

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        n_items = item_weights.shape[0]
        if negatives is None:
            negs = jax.random.randint(key, (self.n_negatives,), 0, n_items)
        else:
            negs = jnp.asarray(negatives)
        neg_w = jnp.take(item_weights, negs, axis=0)  # [n, D]
        pos_w = jnp.take(item_weights, labels, axis=0)  # [B, L, D]

        pos_logit = jnp.einsum(
            "bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32
        )
        neg_logit = jnp.einsum(
            "bld,nd->bln", hidden, neg_w, preferred_element_type=jnp.float32
        )
        # mask accidental positives among negatives
        collide = labels[..., None] == negs[None, None, :]
        neg_logit = jnp.where(collide, NEG, neg_logit)

        all_logits = jnp.concatenate([pos_logit[..., None], neg_logit], axis=-1)
        nll = -jax.nn.log_softmax(all_logits, axis=-1)[..., 0]
        return _masked_mean(nll, mask)


class BCELoss:
    """Full binary cross-entropy: label item positive, all others negative
    (reference: replay/nn/loss/bce.py:10).

    Reference normalization: BCEWithLogitsLoss(reduction="sum") over the
    valid positions' [*, N] rows divided by the number of valid positions —
    i.e. per-position SUM over the catalog, masked-meaned (bce.py:97)."""

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        logits = tying_logits(hidden, item_weights)  # [B, L, N]
        n_items = item_weights.shape[0]
        targets = jax.nn.one_hot(labels, n_items, dtype=jnp.float32)
        per_item = -(
            targets * jax.nn.log_sigmoid(logits)
            + (1.0 - targets) * jax.nn.log_sigmoid(-logits)
        )
        per_pos = jnp.sum(per_item, axis=-1)
        return _masked_mean(per_pos, mask)


class BCESampledLoss:
    """BCE with sampled negatives — the classic SasRec objective
    (reference: replay/nn/loss/bce.py:98).

    Accidental hits (negative == positive label at that position) are
    masked to -1e9 so they contribute ~0, mirroring the reference's
    ``mask_negative_logits`` (loss/base.py:157).  Pass ``negatives``
    ([n] shared or [B, L, n] per-position) to use batch-provided
    negatives (the reference wires ``negative_labels`` from the
    negative-sampling transform); otherwise ``n_negatives`` are drawn
    per position from ``key``."""

    def __init__(self, n_negatives: int = 1):
        self.n_negatives = n_negatives

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        n_items = item_weights.shape[0]
        if negatives is None:
            negs = jax.random.randint(
                key, labels.shape + (self.n_negatives,), 0, n_items
            )  # per-position negatives, as the reference samples
        else:
            negs = jnp.asarray(negatives)
            if negs.ndim == 1:
                negs = jnp.broadcast_to(negs, labels.shape + negs.shape)
        pos_w = jnp.take(item_weights, labels, axis=0)
        neg_w = jnp.take(item_weights, negs, axis=0)  # [B, L, n, D]

        pos_logit = jnp.einsum(
            "bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32
        )
        neg_logit = jnp.einsum(
            "bld,blnd->bln", hidden, neg_w, preferred_element_type=jnp.float32
        )
        collide = negs == labels[..., None]
        neg_logit = jnp.where(collide, NEG, neg_logit)
        loss_pos = -jax.nn.log_sigmoid(pos_logit)
        loss_neg = -jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=-1)
        return _masked_mean(loss_pos + loss_neg, mask)


class LogInCELoss:
    """In-batch contrastive CE (reference: replay/nn/loss/login_ce.py:102).

    Negatives are the other positions' label items within the batch; logQ
    correction subtracts log of in-batch item frequency so popular items are
    not over-penalized.
    """

    def __init__(self, temperature: float = 1.0, log_q_correction: bool = True):
        self.temperature = temperature
        self.log_q_correction = log_q_correction

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        batch, length, dim = hidden.shape
        flat_h = hidden.reshape(-1, dim)
        flat_labels = labels.reshape(-1)
        flat_mask = mask.reshape(-1)

        cand_w = jnp.take(item_weights, flat_labels, axis=0)  # [M, D]
        logits = (
            jnp.einsum("md,nd->mn", flat_h, cand_w, preferred_element_type=jnp.float32)
            / self.temperature
        )
        m = flat_labels.shape[0]
        same_item = flat_labels[:, None] == flat_labels[None, :]
        diag = jnp.eye(m, dtype=bool)
        # other occurrences of my own label are false negatives → mask out
        logits = jnp.where(same_item & ~diag, NEG, logits)
        # padding candidates are not valid negatives
        logits = jnp.where((flat_mask[None, :] == 0) & ~diag, NEG, logits)
        if self.log_q_correction:
            freq = jnp.sum(
                (flat_labels[None, :] == flat_labels[:, None]) & (flat_mask[None, :] == 1),
                axis=1,
            )
            logq = jnp.log(jnp.maximum(freq.astype(jnp.float32), 1.0))
            logits = logits - jnp.where(diag, 0.0, logq[None, :])
        nll = -jnp.diagonal(jax.nn.log_softmax(logits, axis=-1))
        return _masked_mean(nll.reshape(batch, length), mask)


class LogOutCELoss:
    """CE against label + explicitly provided negative ids (reference:
    replay/nn/loss/logout_ce.py:10) — used with negative-sampling batch
    transforms that attach a ``negatives`` array."""

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        if negatives is None:
            msg = "LogOutCELoss requires a negatives array (use UniformNegativeSamplingTransform)"
            raise ValueError(msg)
        labels = _safe_labels(labels, mask)
        neg_w = jnp.take(item_weights, negatives, axis=0)  # [n, D] shared per step
        pos_w = jnp.take(item_weights, labels, axis=0)
        pos_logit = jnp.einsum(
            "bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32
        )
        neg_logit = jnp.einsum(
            "bld,nd->bln", hidden, neg_w, preferred_element_type=jnp.float32
        )
        collide = labels[..., None] == negatives[None, None, :]
        neg_logit = jnp.where(collide, NEG, neg_logit)
        all_logits = jnp.concatenate([pos_logit[..., None], neg_logit], axis=-1)
        nll = -jax.nn.log_softmax(all_logits, axis=-1)[..., 0]
        return _masked_mean(nll, mask)


class ScalableCELoss:
    """Scalable Cross-Entropy via bucketed hard negatives (reference:
    replay/models/nn/loss/sce.py:27, arXiv 2409.18721).

    Random projections hash hidden states and item embeddings into
    ``n_buckets``; each bucket scores its member states against the
    ``bucket_size_y`` items whose projections land closest, approximating
    full softmax with hard negatives at O(B·L·bucket) cost.  Static bucket
    sizes keep every shape jit-stable (SURVEY.md §7 hard parts).
    """

    def __init__(
        self,
        n_buckets: int = 256,
        bucket_size_x: int = 256,
        bucket_size_y: int = 256,
        mix_x: bool = False,
    ):
        self.n_buckets = n_buckets
        self.bucket_size_x = bucket_size_x
        self.bucket_size_y = bucket_size_y
        self.mix_x = mix_x

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        batch, length, dim = hidden.shape
        flat_h = hidden.reshape(-1, dim).astype(jnp.float32)
        flat_labels = labels.reshape(-1)
        flat_mask = mask.reshape(-1).astype(jnp.float32)
        n_items = item_weights.shape[0]
        w = item_weights.astype(jnp.float32)

        # bucket directions: random, or (mix_x) random mixtures of the
        # hidden states themselves (reference sce.py:71-78); selection is
        # gradient-free in the reference (torch.no_grad)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(dim)))
        if self.mix_x:
            omega = scale * jax.random.normal(
                key, (flat_h.shape[0], self.n_buckets), dtype=jnp.float32
            )
            proj = jax.lax.stop_gradient(flat_h).T @ omega  # [D, buckets]
        else:
            proj = scale * jax.random.normal(key, (dim, self.n_buckets), dtype=jnp.float32)
        h_scores = jax.lax.stop_gradient(flat_h) @ proj  # [M, buckets]
        y_scores = jax.lax.stop_gradient(w) @ proj  # [N, buckets]

        # padded states must not occupy bucket_size_x slots
        # (reference sce.py:82: x_bucket[:, ~padding_mask] = -inf)
        h_scores = jnp.where(flat_mask[:, None] > 0, h_scores, -jnp.inf)

        # top bucket_size_x states and bucket_size_y items per bucket
        _, x_idx = jax.lax.top_k(h_scores.T, min(self.bucket_size_x, flat_h.shape[0]))
        _, y_idx = jax.lax.top_k(y_scores.T, min(self.bucket_size_y, n_items))

        xb = jnp.take(flat_h, x_idx, axis=0)  # [buckets, bx, D]
        yb = jnp.take(w, y_idx, axis=0)  # [buckets, by, D]
        bucket_logits = jnp.einsum(
            "kxd,kyd->kxy", xb, yb, preferred_element_type=jnp.float32
        )

        # positive logit computed exactly
        pos_w = jnp.take(w, flat_labels, axis=0)
        pos_logit = jnp.sum(flat_h * pos_w, axis=-1)  # [M]

        # exclude the positive item from its bucket negatives
        labels_in_bucket = jnp.take(flat_labels, x_idx, axis=0)  # [buckets, bx]
        is_pos = y_idx[:, None, :] == labels_in_bucket[:, :, None]
        bucket_logits = jnp.where(is_pos, NEG, bucket_logits)

        # per-(bucket, state) partial logsumexp over bucket negatives
        neg_lse = jax.nn.logsumexp(bucket_logits, axis=-1)  # [buckets, bx]

        # scatter-max partial LSEs back per state: combine across buckets a
        # state appears in via logsumexp-accumulate
        m = flat_h.shape[0]
        acc = jnp.full((m,), -jnp.inf)
        acc = acc.at[x_idx.reshape(-1)].max(neg_lse.reshape(-1))
        total = jnp.logaddexp(pos_logit, acc)
        nll = total - pos_logit
        # states never selected by any bucket (acc = -inf → nll = 0) are
        # dropped from the mean, mirroring the reference's
        # ``loss[(loss != 0) & mask]`` filtering (sce.py:121) — counting
        # them would dilute the signal at high padding fractions
        selected = jnp.isfinite(acc).astype(jnp.float32)
        weight = flat_mask * selected
        return jnp.sum(jnp.where(weight > 0, nll, 0.0)) / jnp.maximum(
            jnp.sum(weight), 1.0
        )


class CEWeightedLoss(CELoss):
    """CE with per-position sample weights (reference: replay/nn/loss/ce.py:84
    CEWeighted) — weights arrive in the batch as ``sample_weights`` [B, L]
    (e.g. time-decay from replay_tpu.utils.time) and scale each position's
    contribution inside the masked mean."""

    def __call__(self, hidden, labels, mask, item_weights, *, sample_weights=None,
                 negatives=None, key=None):
        if sample_weights is None:
            return super().__call__(hidden, labels, mask, item_weights, key=key)
        labels = _safe_labels(labels, mask)
        logits = tying_logits(hidden, item_weights)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * sample_weights.astype(jnp.float32)
        return jnp.sum(jnp.where(w > 0, nll * w, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


class CESampledWeightedLoss(CESampledLoss):
    """Sampled CE with per-position weights (reference: ce.py:252)."""

    def __call__(self, hidden, labels, mask, item_weights, *, sample_weights=None,
                 negatives=None, key=None):
        if sample_weights is None:
            return super().__call__(
                hidden, labels, mask, item_weights, negatives=negatives, key=key
            )
        labels = _safe_labels(labels, mask)
        n_items = item_weights.shape[0]
        if negatives is None:
            negs = jax.random.randint(key, (self.n_negatives,), 0, n_items)
        else:
            negs = jnp.asarray(negatives)
        neg_w = jnp.take(item_weights, negs, axis=0)
        pos_w = jnp.take(item_weights, labels, axis=0)
        pos_logit = jnp.einsum("bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32)
        neg_logit = jnp.einsum("bld,nd->bln", hidden, neg_w, preferred_element_type=jnp.float32)
        collide = labels[..., None] == negs[None, None, :]
        neg_logit = jnp.where(collide, NEG, neg_logit)
        all_logits = jnp.concatenate([pos_logit[..., None], neg_logit], axis=-1)
        nll = -jax.nn.log_softmax(all_logits, axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * sample_weights.astype(jnp.float32)
        return jnp.sum(jnp.where(w > 0, nll * w, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


class BPRLoss:
    """Bayesian Personalized Ranking (Rendle et al., arXiv 1205.2618):
    pairwise -log sigmoid(pos_score - neg_score) over sampled negatives.

    Named in this framework's north-star loss set alongside sampled-softmax
    and CE; the reference reaches BPR through the `implicit` wrapper
    (reference: replay/experimental/models/implicit_wrap.py) — here it is a
    first-class sequential-training loss.
    """

    def __init__(self, n_negatives: int = 1):
        self.n_negatives = n_negatives

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        n_items = item_weights.shape[0]
        if negatives is None:
            negs = jax.random.randint(
                key, labels.shape + (self.n_negatives,), 0, n_items
            )
        else:
            negs = jnp.asarray(negatives)
            if negs.ndim == 1:
                negs = jnp.broadcast_to(negs, labels.shape + negs.shape)
        pos_w = jnp.take(item_weights, labels, axis=0)  # [B, L, D]
        neg_w = jnp.take(item_weights, negs, axis=0)  # [B, L, n, D]
        pos_logit = jnp.einsum(
            "bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32
        )
        neg_logit = jnp.einsum(
            "bld,blnd->bln", hidden, neg_w, preferred_element_type=jnp.float32
        )
        # accidental positives among negatives contribute zero
        collide = labels[..., None] == negs
        pair = jax.nn.log_sigmoid(pos_logit[..., None] - neg_logit)
        pair = jnp.where(collide, 0.0, pair)
        denom = jnp.maximum(jnp.sum(~collide, axis=-1), 1)
        per_pos = -jnp.sum(pair, axis=-1) / denom
        return _masked_mean(per_pos, mask)


class LogInCESampledLoss(LogInCELoss):
    """In-batch contrastive CE extended with explicitly sampled negatives
    (reference: replay/nn/loss/login_ce.py:241 LogInCESampled) — the
    candidate pool per position is the other in-batch labels PLUS a shared
    ``negatives`` array attached by a negative-sampling transform.  logQ
    correction applies to the in-batch part only (sampled negatives are
    uniform, so their correction is a constant)."""

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None,
                 key=None):
        if negatives is None:
            return super().__call__(hidden, labels, mask, item_weights, key=key)
        labels = _safe_labels(labels, mask)
        batch, length, dim = hidden.shape
        flat_h = hidden.reshape(-1, dim)
        flat_labels = labels.reshape(-1)
        flat_mask = mask.reshape(-1)

        cand_w = jnp.take(item_weights, flat_labels, axis=0)
        logits = (
            jnp.einsum("md,nd->mn", flat_h, cand_w,
                       preferred_element_type=jnp.float32) / self.temperature
        )
        m = flat_labels.shape[0]
        same_item = flat_labels[:, None] == flat_labels[None, :]
        diag = jnp.eye(m, dtype=bool)
        logits = jnp.where(same_item & ~diag, NEG, logits)
        logits = jnp.where((flat_mask[None, :] == 0) & ~diag, NEG, logits)
        if self.log_q_correction:
            freq = jnp.sum(
                (flat_labels[None, :] == flat_labels[:, None])
                & (flat_mask[None, :] == 1),
                axis=1,
            )
            logq = jnp.log(jnp.maximum(freq.astype(jnp.float32), 1.0))
            logits = logits - jnp.where(diag, 0.0, logq[None, :])
        # sampled extension: shared negatives scored against every position
        neg_w = jnp.take(item_weights, negatives, axis=0)  # [n, D]
        neg_logits = (
            jnp.einsum("md,nd->mn", flat_h, neg_w,
                       preferred_element_type=jnp.float32) / self.temperature
        )
        neg_logits = jnp.where(
            flat_labels[:, None] == negatives[None, :], NEG, neg_logits
        )
        all_logits = jnp.concatenate([logits, neg_logits], axis=1)
        nll = -jax.nn.log_softmax(all_logits, axis=-1)[jnp.arange(m), jnp.arange(m)]
        return _masked_mean(nll.reshape(batch, length), mask)


class LogOutCEWeightedLoss(LogOutCELoss):
    """LogOutCE with per-position sample weights (reference:
    replay/nn/loss/logout_ce.py:148 LogOutCEWeighted)."""

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None,
                 sample_weights=None, key=None):
        if sample_weights is None:
            return super().__call__(
                hidden, labels, mask, item_weights, negatives=negatives, key=key
            )
        if negatives is None:
            msg = "LogOutCEWeightedLoss requires a negatives array"
            raise ValueError(msg)
        labels = _safe_labels(labels, mask)
        neg_w = jnp.take(item_weights, negatives, axis=0)
        pos_w = jnp.take(item_weights, labels, axis=0)
        pos_logit = jnp.einsum(
            "bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32
        )
        neg_logit = jnp.einsum(
            "bld,nd->bln", hidden, neg_w, preferred_element_type=jnp.float32
        )
        collide = labels[..., None] == negatives[None, None, :]
        neg_logit = jnp.where(collide, NEG, neg_logit)
        all_logits = jnp.concatenate([pos_logit[..., None], neg_logit], axis=-1)
        nll = -jax.nn.log_softmax(all_logits, axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * sample_weights.astype(jnp.float32)
        return jnp.sum(jnp.where(w > 0, nll * w, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


class LossProto(Protocol):
    """The loss contract every class above satisfies (reference:
    replay/nn/loss/base.py LossProto)."""

    def __call__(self, hidden, labels, mask, item_weights, *, key=None): ...


@dataclass
class SCEParams:
    """Hyperparameter bundle for :class:`ScalableCELoss` (reference:
    replay/models/nn/loss SCEParams)."""

    n_buckets: int = 64
    bucket_size_x: int = 64
    bucket_size_y: int = 64
    mix_x: bool = False

    def build(self) -> "ScalableCELoss":
        return ScalableCELoss(
            n_buckets=self.n_buckets,
            bucket_size_x=self.bucket_size_x,
            bucket_size_y=self.bucket_size_y,
            mix_x=self.mix_x,
        )


# Reference import-surface aliases (reference: replay/nn/loss/__init__.py).
#
# The reference's LogInCE and LogOutCE both score the positive against the
# ENTIRE catalog with the positive masked out of the negatives
# (login_ce.py:191 arange(cardinality) + mask_negative_logits;
# logout_ce.py:105 likewise) — for single-positive batches both equal CE
# exactly (differentially tested in tests/parity/test_loss_parity.py).
# LogInCESampled scores positive vs PROVIDED negatives in probability form,
# which for one positive is softmax-CE over [pos | negatives] — our
# LogOutCELoss.  replay_tpu's own in-batch contrastive losses
# (LogInCELoss / LogInCESampledLoss) are a beyond-reference extension and
# keep their replay_tpu names only.
BCE = BCELoss
BCESampled = BCESampledLoss
CE = CELoss
CESampled = CESampledLoss
CEWeighted = CEWeightedLoss
CESampledWeighted = CESampledWeightedLoss


def _eps_clamped_nll(nll, log_epsilon, clamp_border):
    """Reference probability-form loss -clamp(log(p + eps), -B, B) from a
    plain nll = -log p (login_ce.py:233-237): p below eps saturates to
    ~-log(eps) with a vanishing gradient, bounding early-training loss at
    huge catalogs."""
    p = jnp.exp(-nll)
    return -jnp.clip(
        jnp.log(p + jnp.float32(log_epsilon)),
        -jnp.float32(clamp_border),
        jnp.float32(clamp_border),
    )


class LogInCE(CELoss):
    """Reference LogInCE (replay/nn/loss/login_ce.py:102): full-catalog
    probability form — CE for single positives, with the reference's
    log_epsilon floor and clamp_border applied per position (the catalog
    size comes from ``item_weights``)."""

    def __init__(self, cardinality=None, log_epsilon=1e-6, clamp_border=100.0,
                 negative_labels_ignore_index=-100):
        self.cardinality = cardinality
        self.log_epsilon = log_epsilon
        self.clamp_border = clamp_border

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        labels = _safe_labels(labels, mask)
        logits = tying_logits(hidden, item_weights)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return _masked_mean(
            _eps_clamped_nll(nll, self.log_epsilon, self.clamp_border), mask
        )


class LogOutCE(CELoss):
    """Reference LogOutCE (replay/nn/loss/logout_ce.py:10): plain
    CrossEntropyLoss over [positive | catalog-with-positive-masked]
    == CE for single positives (no epsilon/clamp in the reference)."""

    def __init__(self, cardinality=None, negative_labels_ignore_index=-100,
                 **kwargs):
        self.cardinality = cardinality


class LogInCESampled(LogOutCELoss):
    """Reference LogInCESampled (replay/nn/loss/login_ce.py:241): positive
    vs provided negatives in probability form with the reference's
    log_epsilon floor and clamp_border — softmax-CE over [pos | negatives]
    for single positives."""

    def __init__(self, log_epsilon=1e-6, clamp_border=100.0,
                 negative_labels_ignore_index=-100):
        self.log_epsilon = log_epsilon
        self.clamp_border = clamp_border

    def __call__(self, hidden, labels, mask, item_weights, *, negatives=None, key=None):
        if negatives is None:
            msg = "LogInCESampled requires a negatives array (use UniformNegativeSamplingTransform)"
            raise ValueError(msg)
        labels = _safe_labels(labels, mask)
        negatives = jnp.asarray(negatives)
        neg_w = jnp.take(item_weights, negatives, axis=0)
        pos_w = jnp.take(item_weights, labels, axis=0)
        pos_logit = jnp.einsum(
            "bld,bld->bl", hidden, pos_w, preferred_element_type=jnp.float32
        )
        neg_logit = jnp.einsum(
            "bld,nd->bln", hidden, neg_w, preferred_element_type=jnp.float32
        )
        collide = labels[..., None] == negatives[None, None, :]
        neg_logit = jnp.where(collide, NEG, neg_logit)
        all_logits = jnp.concatenate([pos_logit[..., None], neg_logit], axis=-1)
        nll = -jax.nn.log_softmax(all_logits, axis=-1)[..., 0]
        return _masked_mean(
            _eps_clamped_nll(nll, self.log_epsilon, self.clamp_border), mask
        )


LogOutCESampled = CELoss  # the reference equates LogOutCESampled = CE
LogOutCEWeighted = LogOutCEWeightedLoss
ScalableCrossEntropyLoss = ScalableCELoss
SCE = ScalableCELoss
