"""Compute-dtype policy for the neural blocks.

Activations default to bfloat16 on TPU (MXU-native, halves HBM traffic —
the framework dtype policy: params f32, activations bf16, logits/losses
f32) but XLA-CPU only EMULATES bf16 matmuls, ~3x slower than f32.  Blocks
therefore take ``dtype=None`` and resolve it per backend at trace time;
passing an explicit dtype always wins.
"""

from functools import lru_cache
from typing import Optional

import jax.numpy as jnp


@lru_cache(maxsize=1)
def _default_dtype() -> jnp.dtype:
    import jax

    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def resolve_dtype(dtype: Optional[jnp.dtype]) -> jnp.dtype:
    """Explicit dtype, or the backend default (bf16 on TPU, f32 elsewhere).

    The backend default is cached on first query; configure the platform
    (jax.config jax_platforms) before building models.
    """
    return dtype if dtype is not None else _default_dtype()
