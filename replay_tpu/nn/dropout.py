"""Counter-based hash dropout — a drop-in for ``flax.linen.Dropout``.

``jax.random.bernoulli`` costs a full PRNG evaluation per element:
measured on chip at [4096, 50, 256] bf16, the mask generation adds
+1.24 ms (threefry) / +0.59 ms (XLA rbg) per application over the bare
elementwise pass.  A murmur3-finalizer hash of (element index ⊕ per-call
seed) adds +0.11 ms — 5× cheaper than rbg — because it is ~10 integer VPU
ops that fuse into the surrounding elementwise chain with no bit-buffer
materialization.  With 3-4 dropout applications per transformer block this
is worth ≈1.5 ms/step on the headline config (PERF.md round 4).

Semantics match ``nn.Dropout``: Bernoulli(1-rate) keep mask scaled by
1/(1-rate), deterministic flag, ``"dropout"`` RNG collection.  The mask
stream differs from flax's (different PRNG), which is immaterial — any
i.i.d. Bernoulli source is a valid dropout sampler — and the same
construction drives the fused attention kernel's in-kernel dropout
(ops/pallas_attention.py), so fused/unfused paths share one noise family.

reference: torch.nn.Dropout used throughout replay/nn/sequential/*.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def hash_keep_mask(shape, rate: float, seed: jnp.ndarray) -> jnp.ndarray:
    """Bernoulli(1-rate) keep mask from the shared murmur3 noise core
    (ops/hashing.py — the fused attention kernel uses the same family)
    over the element's linear index ⊕ seed.  ``seed``: uint32/int32
    scalar."""
    from replay_tpu.ops.hashing import keep_threshold, murmur_bits

    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    for axis in range(1, len(shape)):
        idx = idx * jnp.uint32(shape[axis]) + jax.lax.broadcasted_iota(
            jnp.uint32, shape, axis
        )
    return murmur_bits(idx, seed) >= keep_threshold(rate)


class HashDropout(nn.Module):
    """``nn.Dropout`` drop-in whose mask comes from :func:`hash_keep_mask`."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        key = self.make_rng("dropout")
        # derive the seed from the KEY DATA, not from generated bits:
        # fold_in/make_rng key derivation is deterministic everywhere, but
        # rbg BIT GENERATION may differ between compilations of the same
        # program (jax PRNG docs) — which broke k_disp=1 vs k_disp=2
        # bitwise equality (tests/nn/test_determinism.py)
        data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
        seed = jax.lax.reduce(
            data, jnp.uint32(0), jax.lax.bitwise_xor, (0,)
        )
        keep = hash_keep_mask(x.shape, float(self.rate), seed)
        scale = 1.0 / (1.0 - float(self.rate))
        return jnp.where(keep, (x * scale).astype(x.dtype), 0).astype(x.dtype)
