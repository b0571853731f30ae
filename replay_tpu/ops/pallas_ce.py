"""Pallas fused flash-CE: exact full-softmax statistics without HBM logits.

The XLA streaming formulation (replay_tpu/nn/tiled_ce.py) is bound by HBM:
XLA materializes every [M, tile] logits buffer it scans (measured ~500 GB
of traffic ≈ 500 ms at B=512, L=50, N=1M, D=64 — the GEMMs alone are
~65 ms).  These kernels keep each [block_m, block_n] logit tile in VMEM,
updating flash-softmax running (max, sum-exp) statistics in scratch, so
HBM touches only the operands: O(M·D + N·D) per pass instead of O(M·N).

Forward grid is (m-blocks, n-blocks) with n innermost: per m-block the
item table streams through VMEM once while [block_m]-row statistics live
in scratch.  The backward is ONE combined kernel (grid (n, m), m
innermost): a single logits/exp recompute feeds both grads — dW
accumulates in scratch, dh is emitted as per-n-block partials summed
outside (Pallas TPU output buffers are write-only/prefetch-pipelined, so
cross-step read-modify-write of dh's m-blocks across the outer n loop
cannot be expressed race-free).  Small catalogs materialize all partials
at once; large ones drive the same kernel one n-block per ``lax.scan``
step with dh in the scan carry (3 streaming GEMMs + one exp total — the
old separate dh/dW kernel pair paid 4 GEMMs + two exps; −23% at N=1M).

The positive-logit term (gather of label rows) and the masked mean stay in
XLA — they are O(M·D) and gather/scatter do not belong in Mosaic.

reference: replay/models/nn/loss/sce.py:27 (the approximation this exact
kernel outperforms).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: kernels cannot capture traced constants
LANES = 128


def _masked_logits(h_ref, w_ref, bias_ref, *, compute_dtype):
    """Tile logits with padded-column masking via ONE broadcast add.

    The kernels are VPU-bound at small catalogs (exp + reductions dominate
    the 2·M·N·D GEMM), so the mask is a precomputed [8, block_n] additive
    row (0 real / NEG_INF padded) instead of per-tile
    iota+compare+select — 1 elementwise op instead of 3 (measured −9% on
    the chip at M=204k, N=3712)."""
    h = h_ref[:]
    w = w_ref[:]
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        w = w.astype(compute_dtype)
    elif h.dtype != w.dtype:
        # the trainer's common case is bf16 activations × f32 weights; a
        # mixed-input dot does not lower — promote to the wider dtype
        wide = jnp.promote_types(h.dtype, w.dtype)
        h = h.astype(wide)
        w = w.astype(wide)
    logits = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_m, block_n]
    return logits + bias_ref[0:1, :], h, w


def _col_bias(n: int, n_pad: int) -> jnp.ndarray:
    """[8, n_pad] f32 additive mask row: 0 for real columns, NEG_INF for
    padding (8 sublanes: the minimum f32 block height)."""
    col = jnp.arange(n_pad, dtype=jnp.int32)
    row = jnp.where(col < n, 0.0, NEG_INF).astype(jnp.float32)
    return jnp.broadcast_to(row[None, :], (8, n_pad))


def _fwd_kernel(h_ref, w_ref, bias_ref, lse_ref, mx_s, s_s, *, n_steps,
                compute_dtype):
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _init():
        mx_s[:] = jnp.full_like(mx_s[:], NEG_INF)
        s_s[:] = jnp.zeros_like(s_s[:])

    logits, _, _ = _masked_logits(
        h_ref, w_ref, bias_ref, compute_dtype=compute_dtype
    )
    tile_max = jnp.max(logits, axis=1, keepdims=True)  # [block_m, 1]
    mx_old = mx_s[:][:, :1]
    mx_new = jnp.maximum(mx_old, tile_max)
    p_sum = jnp.sum(jnp.exp(logits - mx_new), axis=1, keepdims=True)
    s_new = s_s[:][:, :1] * jnp.exp(mx_old - mx_new) + p_sum
    mx_s[:] = jnp.broadcast_to(mx_new, mx_s.shape)
    s_s[:] = jnp.broadcast_to(s_new, s_s.shape)

    @pl.when(ni == n_steps - 1)
    def _fin():
        lse_ref[:] = mx_s[:] + jnp.log(s_s[:])


def _dhw_kernel(h_ref, w_ref, bias_ref, lse_ref, g_ref, dh_part_ref, dw_ref,
                dw_s, *, m_steps, compute_dtype):
    """Combined backward, grid (n, m) m innermost — ONE logits/exp recompute
    feeds both grads.  dW accumulates in scratch over m (the _dw_kernel
    pattern); dh is emitted as per-n partial blocks ([n_steps, M, D], summed
    by XLA outside) so no output block is ever revisited.  Used when
    n_steps is small: the headline catalog (N≈4k, n_steps 2) is
    transcendental-bound — 2.5 G exps across fwd+dh+dW was ~⅔ of the CE
    time — and this removes a full exp+GEMM pass."""
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _init():
        dw_s[:] = jnp.zeros_like(dw_s[:])

    logits, h, w = _masked_logits(
        h_ref, w_ref, bias_ref, compute_dtype=compute_dtype
    )
    p = jnp.exp(logits - lse_ref[:][:, :1]) * g_ref[:][:, :1]
    dh_part_ref[:] = jax.lax.dot_general(
        p.astype(w.dtype), w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[None]
    dw_s[:] = dw_s[:] + jax.lax.dot_general(
        p.astype(h.dtype), h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(mi == m_steps - 1)
    def _fin():
        dw_ref[:] = dw_s[:]


def _fwd_kernel_maxfree(h_ref, w_ref, bias_ref, lse_ref, s_s, *, n_steps,
                        compute_dtype):
    """Shift-free flash forward: lse = log(Σ exp(logits)) with NO per-tile
    max pass or rescale — the max/rescale VPU sweeps were the entire gap to
    the pure-GEMM rate (round-5 chip bisect: 83 ms vs 116 at M=25.6k,
    N=1M, D=256; pure GEMM 82).  Safe while every row's sum stays inside
    f32 range (max logit ≲ 88, which normalized-embedding training never
    approaches); the caller certifies finiteness and lax.cond-falls back
    to the shifted kernel otherwise, so results are exact-or-equal for ANY
    input.  Masked columns carry a −3e38 bias → exp underflows to 0."""
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _init():
        s_s[:] = jnp.zeros_like(s_s[:])

    logits, _, _ = _masked_logits(
        h_ref, w_ref, bias_ref, compute_dtype=compute_dtype
    )
    s_s[:] = s_s[:] + jnp.sum(jnp.exp(logits), axis=1, keepdims=True)

    @pl.when(ni == n_steps - 1)
    def _fin():
        lse_ref[:] = jnp.log(s_s[:])


def _eager_kernel(h_ref, w_ref, bias_ref, g_ref, lse_ref, dh_ref, dw_ref,
                  dw_s, *, m_steps, compute_dtype):
    """Single-pass value+grad: per m-block, the WHOLE catalog's logit row
    lives in VMEM, so exp is computed exactly once for loss statistics AND
    both softmax-term gradients.  The two-pass kernels above pay that exp
    twice (flash_lse forward + recompute in the backward) — at small
    catalogs CE is transcendental-bound, so this halves its cost.  Only
    valid when the cotangent of the downstream reduction is a SCALAR
    (masked mean): ``g_ref`` carries the per-row weight mask/Σmask and the
    caller's backward just scales the saved grads."""
    mi = pl.program_id(0)

    @pl.when(mi == 0)
    def _init():
        dw_s[:] = jnp.zeros_like(dw_s[:])

    logits, h, w = _masked_logits(
        h_ref, w_ref, bias_ref, compute_dtype=compute_dtype
    )
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - mx)  # the ONE exp sweep
    s = jnp.sum(e, axis=1, keepdims=True)
    lse_ref[:] = jnp.broadcast_to(mx + jnp.log(s), lse_ref.shape)
    p = (e * (g_ref[:][:, :1] / s)).astype(w.dtype)  # softmax · row grad
    dh_ref[:] = jax.lax.dot_general(
        p, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw_s[:] = dw_s[:] + jax.lax.dot_general(
        p, h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(mi == m_steps - 1)
    def _fin():
        dw_ref[:] = dw_s[:]


def _eager_lse_kernel(h_ref, w_ref, bias_ref, g_ref, lse_ref, *,
                      compute_dtype):
    """Value-only variant of :func:`_eager_kernel` — IDENTICAL reduction
    order (whole-row max over the full catalog), so the primal call of
    ``flash_ce_mean`` returns bitwise the same loss as the eager fwd while
    skipping the grad GEMMs/outputs that eval-only callers don't need."""
    logits, _, _ = _masked_logits(
        h_ref, w_ref, bias_ref, compute_dtype=compute_dtype
    )
    mx = jnp.max(logits, axis=1, keepdims=True)
    s = jnp.sum(jnp.exp(logits - mx), axis=1, keepdims=True)
    lse_ref[:] = jnp.broadcast_to(mx + jnp.log(s), lse_ref.shape)


def eager_ce_supported(n: int, d: int, block_m: int = 128,
                       itemsize: int = 4) -> bool:
    """True when the one-pass kernel's VMEM footprint fits: full [N_pad, D]
    table + dW scratch + [block_m, N_pad] logits/exp tiles ≤ ~8 MB."""
    n_pad = -(-n // LANES) * LANES
    table = n_pad * d * (itemsize + 4)      # w block + f32 dW scratch
    tiles = 3 * block_m * n_pad * 4         # logits, exp, p
    return table + tiles <= (8 << 20)


def pick_eager_block_m(n: int) -> int:
    """Largest eager block that compiles: the f32 [block_m, n_pad] logits
    tile must stay ≤ ~12 MB of the 16 MB scoped-VMEM (chip-measured round
    5: bm=512 compiles at n_pad 6016 = 12.3 MB, OOMs at 8192 = 16.8 MB).
    Bigger blocks pay off — the headline catalog at bm=512 runs the step
    +2% over the old fixed 128 (169 → 172k ex/s, official protocol)."""
    n_pad = -(-n // LANES) * LANES
    for bm in (512, 256, 128):
        if bm * n_pad * 4 <= (12 << 20):
            return bm
    return 128


def _eager_operands(flat_h, item_weights, g_rows, block_m):
    m, d = flat_h.shape
    n = item_weights.shape[0]
    w_p, n_pad = _pad_rows(item_weights, LANES)
    if not block_m:
        block_m = pick_eager_block_m(n)
    block_m = min(block_m, -(-m // 8) * 8)
    h_p, m_pad = _pad_rows(flat_h, block_m)
    g_p, _ = _pad_rows(
        jnp.broadcast_to(g_rows.reshape(-1, 1).astype(jnp.float32), (m, LANES)),
        block_m,
    )
    bias = _col_bias(n, n_pad)
    specs = [
        pl.BlockSpec((block_m, d), lambda mi: (mi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_pad, d), lambda mi: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, n_pad), lambda mi: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, LANES), lambda mi: (mi, 0),
                     memory_space=pltpu.VMEM),
    ]
    return (h_p, w_p, bias, g_p), specs, block_m, m_pad, n_pad


@partial(jax.jit, static_argnames=("block_m", "interpret", "compute_dtype"))
def flash_lse_and_grads(flat_h, item_weights, g_rows, block_m: int = 0,
                        interpret: bool = False, compute_dtype=None):
    """One fused pass: lse panel + softmax-term dh/dW for a scalar-cotangent
    reduction (``g_rows`` = per-row weights of the masked mean).

    :returns: (lse [M, LANES] f32, dh [M, D] f32, dW [N, D] f32) — the
        softmax terms only; the caller subtracts the positive-label parts.
    """
    m, d = flat_h.shape
    n = item_weights.shape[0]
    ops, in_specs, block_m, m_pad, n_pad = _eager_operands(
        flat_h, item_weights, g_rows, block_m
    )
    grid = (m_pad // block_m,)
    lse, dh, dw = pl.pallas_call(
        partial(_eager_kernel, m_steps=grid[0], compute_dtype=compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_m, LANES), lambda mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda mi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n_pad, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * m_pad * n_pad * d,
            bytes_accessed=(m_pad * 2 + n_pad * 2) * d * 4,
            transcendentals=m_pad * n_pad,
        ),
    )(*ops)
    return lse[:m], dh[:m], dw[:n]


@partial(jax.jit, static_argnames=("block_m", "interpret", "compute_dtype"))
def eager_lse(flat_h, item_weights, block_m: int = 0,
              interpret: bool = False, compute_dtype=None):
    """Value-only twin of :func:`flash_lse_and_grads` with the SAME
    whole-row reduction order — bitwise-equal lse, none of the grad work.
    Used for the primal (undifferentiated) call of ``flash_ce_mean``."""
    m, d = flat_h.shape
    g_dummy = jnp.zeros((m,), jnp.float32)
    ops, in_specs, block_m, m_pad, n_pad = _eager_operands(
        flat_h, item_weights, g_dummy, block_m
    )
    lse = pl.pallas_call(
        partial(_eager_lse_kernel, compute_dtype=compute_dtype),
        grid=(m_pad // block_m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, LANES), lambda mi: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * d,
            bytes_accessed=(m_pad + n_pad) * d * 4,
            transcendentals=m_pad * n_pad,
        ),
    )(*ops)
    return lse[:m]


def _pad_rows(x, multiple):
    m = x.shape[0]
    padded = -(-m // multiple) * multiple
    if padded != m:
        x = jnp.concatenate(
            [x, jnp.zeros((padded - m,) + x.shape[1:], x.dtype)], axis=0
        )
    return x, padded


def _blocks(m, n, block_m, block_n):
    block_n = min(block_n, -(-n // LANES) * LANES)
    block_m = min(block_m, -(-m // 8) * 8)
    return block_m, block_n


# catalogs at/above this row count take the max-free forward (certified,
# exact fallback); smaller ones keep the shifted kernel so the
# fine-tolerance small-catalog test paths are bit-stable across rounds.
# 16384 covers the ML-20M catalog (26,744 items): measured 62.7 → 70.4k
# ex/s (+12%) on the headline-config step at that catalog size
MAXFREE_MIN_N = 16384


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret",
                                   "compute_dtype"))
def flash_lse(flat_h, item_weights, block_m: int = 512, block_n: int = 2048,
              interpret: bool = False, compute_dtype=None):
    """logsumexp(h · Wᵀ) per row, exact, no [M, N] HBM buffer.

    Large catalogs run the max-free kernel first (GEMM-rate — the shifted
    kernel's max/rescale sweeps cost +40% wall time) and certify every row
    finite; a row outside f32's exp range flips a ``lax.cond`` to the
    shifted kernel, so the result is always well-defined.

    :returns: [M, LANES] float32, lane-replicated (callers slice ``[:, 0]``;
        the backward kernels consume the panel directly).
    """
    m, d = flat_h.shape
    n = item_weights.shape[0]
    block_m, block_n = _blocks(m, n, block_m, block_n)
    h_p, m_pad = _pad_rows(flat_h, block_m)
    w_p, n_pad = _pad_rows(item_weights, block_n)
    grid = (m_pad // block_m, n_pad // block_n)
    bias = _col_bias(n, n_pad)
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda mi, ni: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda mi, ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, LANES), lambda mi, ni: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * d,
            bytes_accessed=(grid[0] * n_pad + m_pad) * d * 4,
            transcendentals=m_pad * n_pad,
        ),
    )
    shifted = pl.pallas_call(
        partial(_fwd_kernel, n_steps=grid[1], compute_dtype=compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, LANES), jnp.float32),
            pltpu.VMEM((block_m, LANES), jnp.float32),
        ],
        **common,
    )
    if n < MAXFREE_MIN_N:
        return shifted(h_p, w_p, bias)[:m]
    maxfree = pl.pallas_call(
        partial(_fwd_kernel_maxfree, n_steps=grid[1],
                compute_dtype=compute_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, LANES), jnp.float32)],
        **common,
    )
    fast = maxfree(h_p, w_p, bias)
    ok = jnp.all(jnp.isfinite(fast))
    lse = jax.lax.cond(ok, lambda: fast, lambda: shifted(h_p, w_p, bias))
    return lse[:m]


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret",
                                   "compute_dtype"))
def flash_softmax_grads(flat_h, item_weights, lse_panel, g, block_m: int = 512,
                        block_n: int = 2048, interpret: bool = False,
                        compute_dtype=None):
    """Softmax-term gradients of Σ g·lse(h·Wᵀ): dh = P·W and dW = Pᵀ·h with
    P = softmax(h·Wᵀ)·g, streamed tile-by-tile (no [M, N] buffer).

    ``lse_panel`` is the [M, LANES] output of :func:`flash_lse`.  The caller
    subtracts the positive-label terms.
    :returns: (dh [M, D] float32, dW [N, D] float32).
    """
    m, d = flat_h.shape
    n = item_weights.shape[0]
    block_m, block_n = _blocks(m, n, block_m, block_n)
    h_p, m_pad = _pad_rows(flat_h, block_m)
    w_p, n_pad = _pad_rows(item_weights, block_n)
    lse_p, _ = _pad_rows(lse_panel, block_m)
    # padding rows: g = 0 ⇒ zero contribution to dW; dh rows sliced away
    g_p, _ = _pad_rows(
        jnp.broadcast_to(g.reshape(-1, 1).astype(jnp.float32), (m, LANES)),
        block_m,
    )
    bias = _col_bias(n, n_pad)
    in_specs_nm = [
        pl.BlockSpec((block_m, d), lambda a, b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, d), lambda a, b: (a, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block_n), lambda a, b: (0, a), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, LANES), lambda a, b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, LANES), lambda a, b: (b, 0), memory_space=pltpu.VMEM),
    ]
    n_steps = n_pad // block_n
    m_steps = m_pad // block_m
    # small catalogs (few n-steps): one combined kernel recomputes the
    # logits/exp ONCE for both grads; dh partials cost n_steps·M·D·4 extra
    # HBM bytes, cheap next to the saved exp+GEMM pass
    if n_steps <= 4 and n_steps * m_pad * d * 4 <= (1 << 29):
        dh_parts, dw = pl.pallas_call(
            partial(_dhw_kernel, m_steps=m_steps,
                    compute_dtype=compute_dtype),
            grid=(n_steps, m_steps),
            in_specs=in_specs_nm,
            out_specs=[
                pl.BlockSpec((1, block_m, d), lambda ni, mi: (ni, mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_n, d), lambda ni, mi: (ni, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_steps, m_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((block_n, d), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=6 * m_pad * n_pad * d,
                bytes_accessed=(n_steps * m_pad * 2 + n_pad + m_pad) * d * 4,
                transcendentals=m_pad * n_pad,
            ),
        )(h_p, w_p, bias, lse_p, g_p)
        return jnp.sum(dh_parts, axis=0)[:m], dw[:n]
    # large catalogs: the SAME combined kernel, but driven one n-block per
    # lax.scan step so the dh partial is a single [M, D] buffer instead of
    # the [n_steps, M, D] monster — dh accumulates in the scan carry, dW
    # blocks stack.  Still 3 streaming GEMMs + ONE exp total where the old
    # separate-kernel pair paid 4 GEMMs + two exps; the carry's
    # read-add-write HBM traffic overlaps the GEMMs (round-5 chip sweep at
    # M=25.6k, N=1M, D=256: 228 ms vs 296 — the production backward's -23%;
    # larger per-step chunks are strictly worse: 2→230, 4→240, 8→244).
    kernel = pl.pallas_call(
        partial(_dhw_kernel, m_steps=m_steps, compute_dtype=compute_dtype),
        grid=(1, m_steps),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda a, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, LANES), lambda a, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, LANES), lambda a, b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_m, d), lambda a, b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((block_n, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_n, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * m_pad * block_n * d,
            bytes_accessed=(m_pad * 2 + block_n + m_pad) * d * 4,
            transcendentals=m_pad * block_n,
        ),
    )
    w_blocks = w_p.reshape(n_steps, block_n, d)
    bias_blocks = bias.reshape(8, n_steps, block_n).transpose(1, 0, 2)

    def body(dh_acc, inp):
        w_b, bias_b = inp
        dh_part, dw_b = kernel(h_p, w_b, bias_b, lse_p, g_p)
        return dh_acc + dh_part[0], dw_b

    dh, dw_blocks = jax.lax.scan(
        body, jnp.zeros((m_pad, d), jnp.float32), (w_blocks, bias_blocks)
    )
    return dh[:m], dw_blocks.reshape(n_pad, d)[:n]
