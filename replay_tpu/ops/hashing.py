"""Counter-based mask noise shared by HashDropout and the fused attention
kernel — ONE implementation so the two paths stay one noise family.

Plain jnp integer ops: safe inside Pallas kernels (no pltpu primitives —
the TPU interpreter's ``prng_*`` stub returns zeros) and identical on every
backend.  murmur3's finalizer gives full avalanche on sequential indices,
which is all dropout needs.
"""

import jax.numpy as jnp


def murmur_bits(idx: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """uint32 noise from (element index ⊕ golden-ratio-mixed seed) through
    the murmur3 finalizer."""
    h = idx.astype(jnp.uint32) ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def keep_threshold(rate: float) -> jnp.uint32:
    """Bits ≥ this keep the element: Bernoulli(1-rate)."""
    return jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
