"""Typed model-output dicts (reference: replay/nn/output.py — TrainOutput,
InferenceOutput; torch tensors become jax arrays here)."""

from typing import Tuple

import jax

try:
    from typing import NotRequired, TypedDict
except ImportError:  # pragma: no cover - py<3.11
    from typing_extensions import NotRequired, TypedDict


class TrainOutput(TypedDict):
    """Training-stage output: the scalar ``loss`` (differentiable under
    ``jax.grad``) plus optional per-layer ``hidden_states``
    ``[batch, length, hidden]``."""

    loss: jax.Array
    hidden_states: NotRequired[Tuple[jax.Array, ...]]


class InferenceOutput(TypedDict):
    """Inference-stage output: last-layer ``logits`` plus optional
    per-layer ``hidden_states``."""

    logits: jax.Array
    hidden_states: NotRequired[Tuple[jax.Array, ...]]
