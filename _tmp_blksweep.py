"""Chip sweep: packed attention block_rows at the headline shape."""
import time
import numpy as np
import jax, jax.numpy as jnp
from replay_tpu.ops.pallas_attention import fused_attention_packed

B, H, L, hd = 4096, 2, 50, 32
D = H * hd
q = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), jnp.bfloat16)
bias = jnp.zeros((B, L), jnp.float32)
key = jax.random.PRNGKey(7)

def run(blk):
    @jax.jit
    def fwdbwd(q, k, v):
        def f(q, k, v):
            o = fused_attention_packed(
                q, k, v, bias, num_heads=H, causal=True, scale=hd**-0.5,
                dropout_rate=0.2, dropout_key=key, block_rows=blk)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return l, g
    for _ in range(3):
        l, g = fwdbwd(q, k, v)
    float(l)
    t0 = time.perf_counter()
    for _ in range(20):
        l, g = fwdbwd(q, k, v)
    float(l)
    return (time.perf_counter() - t0) / 20 * 1e3

for blk in (8, 16, 32, 64):
    try:
        print(f"blk={blk}: {run(blk):.2f} ms fwd+bwd", flush=True)
    except Exception as e:
        print(f"blk={blk}: FAILED {str(e)[:200]}", flush=True)
