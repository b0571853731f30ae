"""Position-wise feed-forward blocks (reference: replay/nn/ffn.py:11,60,102).

All matmuls run in the compute dtype (bfloat16 default) against float32
params; XLA fuses the activation into the GEMM epilogue on TPU.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from replay_tpu.nn.dtypes import resolve_dtype
from replay_tpu.nn.dropout import HashDropout


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
        h = HashDropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(dim, dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name="fc2")(h)
        h = HashDropout(self.dropout_rate)(h, deterministic=deterministic)
        return h


class SwiGLU(nn.Module):
    """Gated-linear-unit FFN (reference: replay/nn/ffn.py:60).

    ``use_bias=True`` matches the reference's torch Linears (WG/W1/W2 carry
    biases); the bias-free default is kept for existing replay_tpu
    checkpoints (SasRec's swiglu FFN mode).
    """

    hidden_dim: int
    dropout_rate: float = 0.0
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        # xavier_normal kernels: the reference's reset_parameters applies
        # torch.nn.init.xavier_normal_ to every SwiGLU weight
        # (reference: replay/nn/ffn.py:38,80); flax's lecun default is
        # ~0.7x that scale at these fans (quality-neutral in the round-5
        # synthetic-ML-1M seed sweep — kept for init-semantics parity)
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=self.use_bias, dtype=resolve_dtype(self.dtype),
            param_dtype=jnp.float32, name=name,
            kernel_init=nn.initializers.xavier_normal(),
        )
        gate = dense(self.hidden_dim, "w_gate")(x)
        up = dense(self.hidden_dim, "w_up")(x)
        h = nn.silu(gate) * up
        h = HashDropout(self.dropout_rate)(h, deterministic=deterministic)
        return dense(dim, "w_down")(h)


class SwiGLUEncoder(nn.Module):
    """Two SwiGLU blocks with RMSNorm residuals (reference:
    replay/nn/ffn.py:102 SwiGLUEncoder) — the default TwoTower item encoder:
    ``x = RMSNorm(SwiGLU(x) + x)`` twice, Linears WITH biases.
    """

    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in (1, 2):
            h = SwiGLU(
                hidden_dim=self.hidden_dim,
                use_bias=True,
                dtype=resolve_dtype(self.dtype),
                name=f"sw{i}",
            )(x, deterministic=deterministic)
            x = nn.RMSNorm(
                dtype=resolve_dtype(self.dtype), param_dtype=jnp.float32, name=f"norm{i}"
            )(h + x)
        return x
