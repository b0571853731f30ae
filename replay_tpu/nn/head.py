"""Output heads (reference: replay/nn/head.py:4 EmbeddingTyingHead).

The tying head is a function, not a module: logits are a GEMM of hidden
states against the (possibly candidate-gathered) item embedding table.
Keeping it functional lets losses request logits for arbitrary item subsets
(full catalog / sampled negatives / candidates) through one code path —
the ``logits_callback`` contract of the reference (replay/nn/loss/ce.py:26-47).
"""

import jax.numpy as jnp


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
    logits = jnp.einsum(
        "...d,nd->...n", hidden, item_weights, preferred_element_type=jnp.float32
    )
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
