"""Normalization blocks (reference: replay/nn/normalization.py —
NormalizerProto with LayerNorm/RMSNorm choices)."""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype


class RMSNorm(nn.Module):
    """Root-mean-square layer norm (no mean subtraction, no bias)."""

    epsilon: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        normed = xf / jnp.sqrt(var + self.epsilon)
        return (normed * scale).astype(resolve_dtype(self.dtype))
