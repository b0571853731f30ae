"""Position-wise feed-forward blocks (reference: replay/nn/ffn.py:11,60,102).

All matmuls run in the compute dtype (bfloat16 default) against float32
params; XLA fuses the activation into the GEMM epilogue on TPU.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype


class PointWiseFeedForward(nn.Module):
    """Conv1x1-style FFN used by classic SasRec (reference: replay/nn/ffn.py:11)."""

    hidden_dim: int
    dropout_rate: float = 0.0
    activation: str = "relu"  # "relu" | "gelu" (reference transformer default)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        # exact (erf) gelu — torch's default, so imported checkpoints match
        act = (
            (lambda v: nn.gelu(v, approximate=False))
            if self.activation == "gelu"
            else nn.relu
        )
        h = nn.Dense(self.hidden_dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="fc1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="fc2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h


class SwiGLU(nn.Module):
    """Gated-linear-unit FFN (reference: replay/nn/ffn.py:60)."""

    hidden_dim: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        gate = nn.Dense(self.hidden_dim, use_bias=False, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="w_gate")(x)
        up = nn.Dense(self.hidden_dim, use_bias=False, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="w_up")(x)
        h = nn.silu(gate) * up
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(dim, use_bias=False, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="w_down")(h)
