"""Output heads (reference: replay/nn/head.py:4 EmbeddingTyingHead).

The tying head is a function, not a module: logits are a GEMM of hidden
states against the (possibly candidate-gathered) item embedding table.
Keeping it functional lets losses request logits for arbitrary item subsets
(full catalog / sampled negatives / candidates) through one code path —
the ``logits_callback`` contract of the reference (replay/nn/loss/ce.py:26-47).
"""

import jax
import jax.numpy as jnp


def _gemm_dtype_policy(x: jnp.ndarray) -> jnp.ndarray:
    """bf16 GEMM inputs are the right call on TPU (MXU native) but XLA-CPU
    EMULATES bf16 matmuls ~3x slower than f32 — upcast there.  Accumulation
    is f32 on both paths, so only speed changes, not the loss dtype."""
    if x.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        return x.astype(jnp.float32)
    return x


def tying_logits(
    hidden: jnp.ndarray,
    item_weights: jnp.ndarray,
    bias: jnp.ndarray = None,
) -> jnp.ndarray:
    """Score hidden states against item embeddings.

    :param hidden: [..., D] hidden states.
    :param item_weights: [N, D] item embedding rows.
    :returns: [..., N] float32 logits.
    """
    hidden = _gemm_dtype_policy(hidden)
    item_weights = _gemm_dtype_policy(item_weights)
    # flatten leading dims: one [M, D]x[D, N] GEMM instead of a batched
    # matmul over tiny per-row GEMMs (2.5x on XLA-CPU; free elsewhere)
    lead = hidden.shape[:-1]
    logits = jnp.dot(
        hidden.reshape(-1, hidden.shape[-1]),
        item_weights.T,
        preferred_element_type=jnp.float32,
    ).reshape(*lead, item_weights.shape[0])
    if bias is not None:
        logits = logits + bias
    return logits


class EmbeddingTyingHead:
    """Callable head bound to an embedder's item table (reference:
    replay/nn/head.py:4)."""

    def __init__(self, get_item_weights):
        self._get_item_weights = get_item_weights

    def __call__(self, hidden: jnp.ndarray, item_ids: jnp.ndarray = None) -> jnp.ndarray:
        return tying_logits(hidden, self._get_item_weights(item_ids))
