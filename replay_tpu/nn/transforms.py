"""Batch transforms: pure functions Batch → Batch.

TPU-native analog of the reference's torch batch transforms (reference:
replay/nn/transform/*.py — NextTokenTransform, TokenMaskTransform,
UniformNegativeSamplingTransform, TrimTransform, SequenceRollTransform,
Rename/Copy/Select/Unsqueeze and the per-model templates
replay/nn/transform/template/{sasrec,twotower}.py:9).

The reference applies transforms on-device in ``on_after_batch_transfer``
(replay/data/nn/parquet/parquet_module.py:191-194); here they are pure
``jnp`` functions composed with ``Compose`` and traced *inside* the jitted
train step, so XLA fuses them into the forward pass for free.  Randomized
transforms take an explicit PRNG key (counter-based, replica-stable).

A batch is a dict of arrays; sequential features are left-padded [B, L].
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Batch = Dict[str, jnp.ndarray]


class Compose:
    """Sequentially apply transforms, splitting the key per stage."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, batch: Batch, key: Optional[jax.Array] = None) -> Batch:
        for i, t in enumerate(self.transforms):
            subkey = jax.random.fold_in(key, i) if key is not None else None
            batch = t(batch, key=subkey)
        return batch


class NextTokenTransform:
    """Shift-by-one causal LM targets (reference:
    replay/nn/transform/next_token.py).

    For left-padded sequences input[t] predicts label[t] = seq[t+1]:
    ``input = seq[:, :-1]``, ``label = seq[:, 1:]``; all sequential
    features and the padding mask are trimmed consistently.  Output length
    is L-1 (static).
    """

    # the shift consumes one position; the trainer fetches batches one longer
    extra_length = 1

    def __init__(self, label_field: str = "labels", apply_to: Optional[Sequence[str]] = None):
        self.label_field = label_field
        self.apply_to = apply_to

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        # label = next item; the item sequence itself defines the labels
        seq_fields = [
            k
            for k, v in batch.items()
            if hasattr(v, "ndim") and v.ndim >= 2 and k not in ("batch_mask",)
        ]
        if self.apply_to is not None:
            seq_fields = [k for k in seq_fields if k in self.apply_to or k == "padding_mask"]
        label_source = self.label_field_source(batch)
        out[self.label_field] = batch[label_source][:, 1:]
        # label validity: the *label* position must be real
        out["labels_padding_mask"] = batch["padding_mask"][:, 1:]
        for k in seq_fields:
            out[k] = batch[k][:, :-1]
        return out

    @staticmethod
    def label_field_source(batch: Batch) -> str:
        if "item_id" in batch:
            return "item_id"
        cands = [k for k, v in batch.items() if hasattr(v, "ndim") and v.ndim == 2]
        return cands[0]


class TokenMaskTransform:
    """BERT-style random masking (reference: replay/nn/transform/token_mask.py,
    Bert4RecUniformMasker replay/models/nn/sequential/bert4rec/dataset.py:55).

    Adds ``token_mask`` [B, L] {0,1}: 1 = position selected for prediction.
    The final valid position is always maskable so every row trains; masking
    probability applies to real tokens only.
    """

    def __init__(self, mask_prob: float = 0.15):
        self.mask_prob = mask_prob

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        pad = batch["padding_mask"]
        rand = jax.random.uniform(key, pad.shape)
        token_mask = (rand < self.mask_prob) & (pad == 1)
        # guarantee ≥1 masked position per row: force the last real token
        # where nothing was selected
        any_masked = jnp.any(token_mask, axis=1, keepdims=True)
        length = pad.shape[1]
        last_real = jnp.where(pad[:, ::-1].argmax(axis=1) < length, length - 1 - pad[:, ::-1].argmax(axis=1), 0)
        force = jax.nn.one_hot(last_real, length, dtype=jnp.bool_) & (pad == 1)
        token_mask = jnp.where(any_masked, token_mask, force)
        out["token_mask"] = token_mask.astype(jnp.int8)
        return out


class MaskedLMTransform:
    """Masked-LM training batch for Bert4Rec (reference:
    replay/models/nn/sequential/bert4rec/dataset.py:55 Bert4RecUniformMasker
    + replay/nn/transform/token_mask.py).

    labels = original item ids; masked positions' item ids are replaced by
    the mask token; ``labels_padding_mask`` = the token mask, so the loss
    trains only on masked positions.
    """

    extra_length = 0

    def __init__(self, mask_prob: float, mask_token: int, item_field: str = "item_id"):
        self.mask_prob = mask_prob
        self.mask_token = mask_token
        self.item_field = item_field
        self._masker = TokenMaskTransform(mask_prob)

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = self._masker(batch, key=key)
        token_mask = out["token_mask"]
        items = batch[self.item_field]
        out["labels"] = items
        out[self.item_field] = jnp.where(token_mask == 1, self.mask_token, items)
        out["labels_padding_mask"] = token_mask
        return out


class UniformNegativeSamplingTransform:
    """Attach a shared negative-id set (reference:
    replay/nn/transform/negative_sampling.py).

    Negatives are drawn WITHOUT replacement via Gumbel-top-k — the
    XLA-friendly exact equivalent of the reference's
    torch.multinomial(replacement=False) — proportionally to
    ``sample_distribution`` when given, else uniformly.  Without-replacement
    costs one [n_items] gumbel draw + top-k per batch (cheap relative to a
    train step even at 1M+ items, but not free); pass ``replacement=True``
    for the O(k) i.i.d. draw, statistically indistinguishable when
    n_negatives ≪ n_items.
    """

    def __init__(
        self,
        n_negatives: int,
        n_items: int,
        field: str = "negatives",
        sample_distribution=None,
        replacement: bool = False,
    ):
        if sample_distribution is not None:
            sample_distribution = jnp.asarray(sample_distribution, dtype=jnp.float32)
            if sample_distribution.shape[-1] != n_items:
                msg = (
                    f"sample_distribution has size {sample_distribution.shape[-1]}, "
                    f"expected {n_items}"
                )
                raise ValueError(msg)
            if not replacement and int((sample_distribution > 0).sum()) < n_negatives:
                msg = (
                    f"sample_distribution has only "
                    f"{int((sample_distribution > 0).sum())} positive-weight items "
                    f"but n_negatives={n_negatives} (sampling is without replacement)"
                )
                raise ValueError(msg)
        if not replacement and n_negatives >= n_items:
            msg = (
                "The `n_negatives` parameter has an incorrect value. "
                f"Got {n_negatives}, expected less than cardinality of items "
                f"catalog ({n_items})."
            )
            raise ValueError(msg)
        self.n_negatives = n_negatives
        self.n_items = n_items
        self.field = field
        self.sample_distribution = sample_distribution
        self.replacement = replacement

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        if self.replacement:
            if self.sample_distribution is None:
                out[self.field] = jax.random.randint(
                    key, (self.n_negatives,), 0, self.n_items
                )
            else:
                logw = jnp.log(jnp.maximum(self.sample_distribution, 0.0))
                out[self.field] = jax.random.categorical(
                    key, logw, shape=(self.n_negatives,)
                )
        else:
            if self.sample_distribution is None:
                logw = jnp.zeros((self.n_items,))
            else:
                logw = jnp.log(jnp.maximum(self.sample_distribution, 0.0))
            gumbel = jax.random.gumbel(key, (self.n_items,))
            _, idx = jax.lax.top_k(logw + gumbel, self.n_negatives)
            out[self.field] = idx
        return out


class MultiClassNegativeSamplingTransform:
    """Per-class negative sampling from a fixed class-assignment matrix
    (reference: replay/nn/transform/negative_sampling.py:82).

    ``sample_mask`` is [n_classes, n_items] with nonnegative weights; for
    each class, ``num_negative_samples`` items are drawn without replacement
    proportionally to the weights (Gumbel-top-k — the XLA-friendly exact
    equivalent of torch.multinomial(replacement=False)), then rows are
    gathered per batch element via the ``negative_selector`` field.
    Output: ``negative_labels`` [B, num_negative_samples].
    """

    def __init__(
        self,
        num_negative_samples: int,
        sample_mask,
        negative_selector_name: str = "negative_selector",
        out_field: str = "negative_labels",
    ):
        sample_mask = jnp.asarray(sample_mask, dtype=jnp.float32)
        if sample_mask.ndim != 2:
            msg = (
                "sample_mask must be [n_classes, n_items], got "
                f"{sample_mask.ndim} dims"
            )
            raise ValueError(msg)
        if num_negative_samples >= sample_mask.shape[1]:
            msg = (
                f"num_negative_samples={num_negative_samples} must be less than "
                f"the catalog size {sample_mask.shape[1]}"
            )
            raise ValueError(msg)
        # torch.multinomial(replacement=False) errors when a class has fewer
        # positive-weight items than samples; match it at construction so
        # zero-weight (forbidden) items can never leak out of the top-k
        eligible = (sample_mask > 0).sum(axis=1)
        if int(eligible.min()) < num_negative_samples:
            short = int(jnp.argmin(eligible))
            msg = (
                f"class {short} has only {int(eligible.min())} positive-weight "
                f"items but num_negative_samples={num_negative_samples}"
            )
            raise ValueError(msg)
        self.num_negative_samples = num_negative_samples
        self.sample_mask = sample_mask
        self.negative_selector_name = negative_selector_name
        self.out_field = out_field

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        selector = batch[self.negative_selector_name]
        logw = jnp.log(jnp.maximum(self.sample_mask, 0.0))  # 0-weight → -inf
        gumbel = jax.random.gumbel(key, self.sample_mask.shape)
        _, per_class = jax.lax.top_k(logw + gumbel, self.num_negative_samples)
        out[self.out_field] = jnp.take(per_class, selector, axis=0)
        return out


class EqualityMaskTransform:
    """Combine the boolean mask with a feature == value test (reference:
    replay/nn/transform/equality_mask.py:6) — e.g. train only on events of a
    given type."""

    _OPS = {
        "and": jnp.logical_and,
        "or": jnp.logical_or,
        "xor": jnp.logical_xor,
    }

    def __init__(
        self,
        feature_name: str,
        equality_value,
        mode: str = "and",
        mask_name: str = "labels_padding_mask",
    ):
        if mode not in self._OPS:
            msg = f"Mode={mode} is not supported. Possible values are 'and', 'or', 'xor'."
            raise ValueError(msg)
        self.feature_name = feature_name
        self.equality_value = equality_value
        self.mode = mode
        self.mask_name = mask_name

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        eq = batch[self.feature_name] == self.equality_value
        combined = self._OPS[self.mode](batch[self.mask_name].astype(bool), eq)
        out[self.mask_name] = combined.astype(batch[self.mask_name].dtype)
        return out


class AdaptiveTrimTransform:
    """Trim left-padded sequences to the longest real length in the batch
    (reference: replay/nn/transform/trim.py:50).

    The output length is data-dependent, so this is a HOST-side transform for
    validation/inference loops (each distinct resulting length triggers one
    XLA compile downstream); do not compose it inside a jitted train step.

    :param bucket: round the trimmed length up to the next power of two so
        downstream jitted calls compile at most O(log L) distinct shapes
        instead of one per observed batch length — the TPU-friendly mode
        (the reference's torch backend pays nothing for dynamic shapes, XLA
        does).  Default off for exact reference semantics.
    """

    def __init__(
        self,
        apply_to: Optional[Sequence[str]] = None,
        mask_name: str = "padding_mask",
        bucket: bool = False,
    ):
        self.apply_to = list(apply_to) if apply_to is not None else None
        self.mask_name = mask_name
        self.bucket = bucket

    def __call__(self, batch: Batch, key=None) -> Batch:
        if self.mask_name not in batch:
            msg = f"Padding mask '{self.mask_name}' not found in batch."
            raise KeyError(msg)
        pad = batch[self.mask_name]
        max_len = int(jnp.asarray(pad).sum(axis=1).max())
        max_len = max(max_len, 1)
        if self.bucket:
            max_len = 1 << (max_len - 1).bit_length()
            max_len = min(max_len, pad.shape[1])
        if max_len == pad.shape[1]:
            return batch
        out = dict(batch)
        for k, v in batch.items():
            if self.apply_to is not None and k not in self.apply_to and k != self.mask_name:
                continue
            if hasattr(v, "ndim") and v.ndim >= 2 and k != "batch_mask":
                out[k] = v[:, -max_len:]
        return out


class TrimTransform:
    """Keep the last ``seq_len`` positions (reference: replay/nn/transform/trim.py:4)."""

    def __init__(self, seq_len: int, apply_to: Optional[Sequence[str]] = None):
        self.seq_len = seq_len
        self.apply_to = apply_to

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        for k, v in batch.items():
            if self.apply_to is not None and k not in self.apply_to:
                continue
            if hasattr(v, "ndim") and v.ndim >= 2 and k != "batch_mask":
                out[k] = v[:, -self.seq_len :]
        return out


class SequenceRollTransform:
    """Roll sequences by ``shift`` along the time axis, filling the vacated
    positions with ``padding_value`` (reference:
    replay/nn/transform/sequence_roll.py — torch.roll wraps around, so the
    reference overwrites the wrapped slots; matching that here)."""

    def __init__(
        self,
        shift: int = -1,
        apply_to: Optional[Sequence[str]] = None,
        padding_value: int = 0,
    ):
        self.shift = shift
        self.apply_to = apply_to
        self.padding_value = padding_value

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        for k, v in batch.items():
            if self.apply_to is not None and k not in self.apply_to:
                continue
            if hasattr(v, "ndim") and v.ndim >= 2 and k != "batch_mask":
                rolled = jnp.roll(v, self.shift, axis=1)
                pos = jnp.arange(v.shape[1])
                if self.shift > 0:
                    vacated = pos < self.shift
                elif self.shift < 0:
                    vacated = pos >= v.shape[1] + self.shift
                else:
                    out[k] = rolled
                    continue
                shape = (1, v.shape[1]) + (1,) * (v.ndim - 2)
                out[k] = jnp.where(
                    vacated.reshape(shape),
                    jnp.asarray(self.padding_value, dtype=rolled.dtype),
                    rolled,
                )
        return out


class RenameTransform:
    """Rename batch fields (reference: replay/nn/transform/rename.py)."""

    def __init__(self, mapping: Dict[str, str]):
        self.mapping = mapping

    def __call__(self, batch: Batch, key=None) -> Batch:
        return {self.mapping.get(k, k): v for k, v in batch.items()}


class CopyTransform:
    def __init__(self, mapping: Dict[str, str]):
        self.mapping = mapping

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        for src, dst in self.mapping.items():
            out[dst] = batch[src]
        return out


class UnsqueezeTransform:
    """Add a trailing (or given) axis to named fields (reference:
    replay/nn/transform/unsqueeze.py)."""

    def __init__(self, fields, axis: int = -1):
        self.fields = [fields] if isinstance(fields, str) else list(fields)
        self.axis = axis

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = dict(batch)
        for f in self.fields:
            out[f] = jnp.expand_dims(batch[f], self.axis)
        return out


class GroupTransform:
    """Nest named fields under a sub-dict (reference:
    replay/nn/transform/grouping.py — the feature_tensors grouping).
    Grouped fields LEAVE the top level, exactly like the reference
    (grouping.py:34 drops every grouped key — round-5 parity fix)."""

    def __init__(self, groups):
        self.groups = groups  # {group_name: [field, ...]}
        self._grouped = set().union(*groups.values()) if groups else set()

    def __call__(self, batch: Batch, key=None) -> Batch:
        out = {k: v for k, v in batch.items() if k not in self._grouped}
        for name, fields in self.groups.items():
            out[name] = {f: batch[f] for f in fields if f in batch}
        return out


class SelectTransform:
    def __init__(self, fields: Sequence[str]):
        self.fields = set(fields)

    def __call__(self, batch: Batch, key=None) -> Batch:
        return {k: v for k, v in batch.items() if k in self.fields}


# reference name for the uniform masked-LM masker
# (replay/models/nn/sequential/bert4rec/dataset.py Bert4RecUniformMasker)
Bert4RecUniformMasker = MaskedLMTransform
