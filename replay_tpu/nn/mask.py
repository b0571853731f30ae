"""Attention-mask builders as composable blocks (reference:
replay/nn/mask.py:58 DefaultAttentionMask).

Functional core in replay_tpu.nn.attention.build_attention_bias; these
wrappers carry configuration for block-style model composition.
"""

import jax.numpy as jnp

from replay_tpu.nn.attention import build_attention_bias


class DefaultAttentionMask:
    """Padding (+ optional causal band) additive attention bias."""

    def __init__(self, causal: bool = True):
        self.causal = causal

    def __call__(self, padding_mask: jnp.ndarray) -> jnp.ndarray:
        return build_attention_bias(padding_mask, causal=self.causal)
