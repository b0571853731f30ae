"""Bisect the embed+opt+overhead slice of the headline step."""
import time
import numpy as np
import bench as B
import jax, jax.numpy as jnp

import _tmp_bisect as bi

# E alone: blocks=0, zero loss
tr, step, db = bi.build(0, loss=bi.ZeroLoss())
print(f"blocks=0 zero-loss step (E): {bi.time_step(step, tr.state, db):.2f} ms", flush=True)

# embedding gather fwd+bwd alone (the table + scatter-add grad)
ids = jnp.asarray(np.random.default_rng(0).integers(0, B.N_ITEMS, (B.BATCH, B.SEQ_LEN + 1), dtype=np.int32))
table = jnp.zeros((3840, B.DIM), jnp.float32)

@jax.jit
def embed_roundtrip(table, ids):
    def f(t):
        e = jnp.take(t, ids, axis=0).astype(jnp.bfloat16)
        return jnp.sum(e.astype(jnp.float32) * 1e-6)
    l, g = jax.value_and_grad(f)(table)
    return l, g

for _ in range(3):
    l, g = embed_roundtrip(table, ids)
float(l)
t0 = time.perf_counter()
for _ in range(20):
    l, g = embed_roundtrip(table, ids)
float(l); np.asarray(g[0, 0])
print(f"embed gather+scatter-grad: {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)

# one-hot GEMM alternative for the embedding grad at this shape
dh = jnp.ones((B.BATCH * (B.SEQ_LEN + 1), B.DIM), jnp.bfloat16)
flat = ids.reshape(-1)

@jax.jit
def grad_via_gemm(dh, flat):
    # dW[v, d] = sum_i [flat[i]==v] dh[i, d]  via tiled one-hot matmuls
    n_rows = flat.shape[0]
    tile = 32768
    def body(c, s):
        seg_dh = jax.lax.dynamic_slice_in_dim(dh, s, tile, 0)
        seg_id = jax.lax.dynamic_slice_in_dim(flat, s, tile, 0)
        oh = (seg_id[:, None] == jnp.arange(3840)[None, :]).astype(jnp.bfloat16)
        return c + jax.lax.dot_general(oh, seg_dh, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32), None
    out, _ = jax.lax.scan(body, jnp.zeros((3840, B.DIM), jnp.float32),
                          jnp.arange(0, n_rows - tile + 1, tile))
    return out

for _ in range(3):
    g2 = grad_via_gemm(dh, flat)
np.asarray(g2[0, 0])
t0 = time.perf_counter()
for _ in range(20):
    g2 = grad_via_gemm(dh, flat)
np.asarray(g2[0, 0])
print(f"embed grad via one-hot GEMM: {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)
