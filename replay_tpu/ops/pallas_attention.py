"""Fused self-attention core (scores → bias → softmax → dropout → PV) as a
single Pallas kernel with a custom-VJP recompute backward.

The encoder hot loop (reference: replay/nn/sequential/sasrec/model.py:85-113
torch MultiheadAttention; our XLA path in replay_tpu/nn/attention.py) at
recsys sequence lengths (L ≈ 50-200) is not flash-attention territory — the
whole [L, L] score tile fits VMEM per batch block.  What the XLA lowering
pays for instead is the [B·H, L, L] attention-weight tensor round-tripping
HBM between the QKᵀ GEMM, softmax, dropout mask generation/application and
the PV GEMM, plus the same tensor again in the backward pass (round-3 step
bisect: ~12 ms of the 36 ms train step).  This kernel keeps the weight tile
in VMEM end to end:

- forward: one grid pass over B·H blocks; batched MXU GEMMs, f32 softmax,
  causal/key-padding masks from iotas/bias lanes, and attention-weight
  dropout from a counter-based in-kernel hash (murmur3 finalizer of the
  element's global index ⊕ seed — this is the feature that rules out stock
  flash kernels);
- backward: recomputes the weight tile from q/k/v (cheap — scores FLOPs ≪
  HBM cost of saving [B·H, L, L]) and regenerates the SAME dropout mask
  from the same seed, then forms dv/dp/ds/dq/dk with batched GEMMs.

HBM traffic drops from O(B·H·L²) per pass to O(B·H·L·hd) — the q/k/v/o
tensors themselves.

Numerics follow the XLA path: bf16-or-f32 GEMM inputs, f32 score/softmax
accumulation, masks at -0.7·float_max (not -inf: exp(-inf - -inf) is NaN).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3e38  # -0.7 × f32 max; python float (kernels can't capture tracers)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dropout_keep(shape, rate: float, seed, elem_offset):
    """Keep-mask: hash bits ≥ rate·2³² keep (shared noise family with
    nn.dropout.HashDropout — ops/hashing.py).  ``elem_offset`` is the
    global linear index of this block's first element (program-id
    dependent), so the backward pass regenerates the forward's mask."""
    from replay_tpu.ops.hashing import keep_threshold, murmur_bits

    b = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    q = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    l = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    idx = elem_offset + (b * shape[1] + q) * shape[2] + l
    return murmur_bits(idx, seed) >= keep_threshold(rate)


def _scores(q, k, bias, *, scale: float, causal: bool):
    """[blk, LP, hd] × [blk, LP, hd] → biased/masked f32 scores [blk, LP, LP]."""
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias[:, None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col <= row, s, NEG_INF)
    return jnp.maximum(s, NEG_INF)


def _softmax(s):
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=2, keepdims=True)


def _attn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                     *, scale: float, causal: bool, rate: float):
    p = _softmax(_scores(q_ref[:], k_ref[:], bias_ref[:], scale=scale, causal=causal))
    if rate > 0.0:
        blk_elems = p.shape[0] * p.shape[1] * p.shape[2]
        keep = _dropout_keep(p.shape, rate, seed_ref[0], pl.program_id(0) * blk_elems)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref,
                     *, scale: float, causal: bool, rate: float):
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]
    p = _softmax(_scores(q, k, bias_ref[:], scale=scale, causal=causal))
    if rate > 0.0:
        # SAME (seed, index) schedule as the forward pass → identical mask
        blk_elems = p.shape[0] * p.shape[1] * p.shape[2]
        keep = _dropout_keep(p.shape, rate, seed_ref[0], pl.program_id(0) * blk_elems)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p
    compute_dt = v.dtype

    # dv[b, kv, d] = Σ_q pd[b, q, kv] · do[b, q, d]
    dv = jax.lax.dot_general(
        pd.astype(compute_dt), do,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dpd[b, q, kv] = Σ_d do[b, q, d] · v[b, kv, d]
    dpd = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
    ds = (ds * scale).astype(compute_dt)
    # dq[b, q, d] = Σ_kv ds[b, q, kv] · k[b, kv, d]
    dq = jax.lax.dot_general(
        ds, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dk[b, kv, d] = Σ_q ds[b, q, kv] · q[b, q, d]
    dk = jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _pick_block_bh(bh: int, lp: int, itemsize: int = 2) -> int:
    """Largest block keeping the f32 score tile ≤ ~512 KB of VMEM.

    The kernel holds ~5 live [blk, lp, lp] f32 temporaries (scores, exp,
    softmax, dropout bits, dropped weights) plus double-buffered q/k/v/o
    blocks; a 512 KB score tile keeps the Mosaic stack ≈ 3-4 MB, well
    under the 16 MB scoped-vmem limit (measured: 2 MB tiles → 22.3 MB
    stack → compile-time OOM at BH=8192, lp=64).  f32 inputs double the
    q/k/v/dq/dk/dv block bytes → halve the block (measured: f32 at blk=32
    → 18.6 MB backward stack → OOM)."""
    budget = (512 * 1024) // (lp * lp * 4)
    if itemsize >= 4:
        budget //= 2
    # callers pad bh UP to a multiple of the returned block (bh_pad) — do
    # not shrink the block toward 1 for awkward batch sizes, which would
    # under-fill the MXU with 1-row grid steps
    return min(max(8, min(128, budget)), -(-bh // 8) * 8)


def _packed_head_slices(ref, num_heads: int):
    """[blk, lp, H·hd] block → per-head [blk, lp, hd] value slices (static
    lane slices — Mosaic-safe, unlike a >2-D reshape of the lane axis)."""
    blk, lp, d = ref.shape
    hd = d // num_heads
    x = ref[:]
    return [x[:, :, h * hd : (h + 1) * hd] for h in range(num_heads)]


def _packed_dropout_idx(shape, num_heads: int, head: int, lp: int, blk_b: int):
    """Global element index matching the merged-head kernel's schedule:
    idx = ((b_global·H + h)·lp + q)·lp + l — the packed and [B·H] layouts
    are the SAME noise family for the same seed.  ``head`` must be the
    GLOBAL head index and ``num_heads`` the total head count (the chunked
    grid adds program_id(1)·heads_per_step to its local index)."""
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + pl.program_id(0) * blk_b
    q = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    l = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return ((b * num_heads + head) * lp + q) * lp + l


def _attn_fwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                            *, scale: float, causal: bool, rate: float,
                            num_heads: int, total_heads: int = 0):
    """``num_heads`` = heads in THIS block (= chunk size on the chunked
    grid); ``total_heads`` = model head count for the dropout schedule
    (0 → unchunked, num_heads is total)."""
    from replay_tpu.ops.hashing import keep_threshold, murmur_bits

    qs = _packed_head_slices(q_ref, num_heads)
    ks = _packed_head_slices(k_ref, num_heads)
    vs = _packed_head_slices(v_ref, num_heads)
    blk_b, lp, _ = q_ref.shape
    all_heads = total_heads or num_heads
    h_base = pl.program_id(1) * num_heads if total_heads else 0
    outs = []
    for h in range(num_heads):
        p = _softmax(_scores(qs[h], ks[h], bias_ref[:], scale=scale, causal=causal))
        if rate > 0.0:
            idx = _packed_dropout_idx(p.shape, all_heads, h_base + h, lp, blk_b)
            keep = murmur_bits(idx, seed_ref[0]) >= keep_threshold(rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        outs.append(
            jax.lax.dot_general(
                p.astype(vs[h].dtype), vs[h],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[:] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


def _attn_bwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                            dq_ref, dk_ref, dv_ref,
                            *, scale: float, causal: bool, rate: float,
                            num_heads: int, total_heads: int = 0):
    from replay_tpu.ops.hashing import keep_threshold, murmur_bits

    qs = _packed_head_slices(q_ref, num_heads)
    ks = _packed_head_slices(k_ref, num_heads)
    vs = _packed_head_slices(v_ref, num_heads)
    dos = _packed_head_slices(do_ref, num_heads)
    blk_b, lp, _ = q_ref.shape
    all_heads = total_heads or num_heads
    h_base = pl.program_id(1) * num_heads if total_heads else 0
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        q, k, v, do = qs[h], ks[h], vs[h], dos[h]
        p = _softmax(_scores(q, k, bias_ref[:], scale=scale, causal=causal))
        if rate > 0.0:
            idx = _packed_dropout_idx(p.shape, all_heads, h_base + h, lp, blk_b)
            keep = murmur_bits(idx, seed_ref[0]) >= keep_threshold(rate)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        compute_dt = v.dtype
        dv = jax.lax.dot_general(
            pd.astype(compute_dt), do,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
        ds = (ds * scale).astype(compute_dt)
        dqs.append(
            jax.lax.dot_general(
                ds, k,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dks.append(
            jax.lax.dot_general(
                ds, q,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dvs.append(dv)
    dq_ref[:] = jnp.concatenate(dqs, axis=2).astype(dq_ref.dtype)
    dk_ref[:] = jnp.concatenate(dks, axis=2).astype(dk_ref.dtype)
    dv_ref[:] = jnp.concatenate(dvs, axis=2).astype(dv_ref.dtype)


def _packed_block_budget(lp: int, num_heads: int, itemsize: int) -> int:
    """Batch rows per block for bf16 inputs: ~1 MB of f32 score tile per
    head (chip sweep at lp=64/H=2: blk 8 → 5.25 ms, 16 → 4.93, 32 → 4.84
    fwd+bwd, 64 → compile OOM — so target the 32-row point).  The head
    loop is unrolled, so all H score tiles can be live at once — the
    budget divides by H.  f32 inputs double every block and temporary:
    keep their budget at the conservative 512 KB/2 point."""
    budget = (1024 * 1024) // (lp * lp * 4)
    if itemsize >= 4:
        budget //= 4
    return budget // num_heads


def packed_supported(lp: int, num_heads: int, itemsize: int) -> bool:
    """True when the FULLY-UNROLLED packed layout fits the scoped-VMEM
    envelope at a block of ≥ 8 batch rows.  Shapes that fail here (long
    sequences × many heads — e.g. lp=256, H=4 measured 24.6 MB stack when
    the block floor forced blk=8) can still run transpose-free via
    head-chunking: see :func:`auto_head_chunk`."""
    return _packed_block_budget(lp, num_heads, itemsize) >= 8


def auto_head_chunk(lp: int, num_heads: int, head_dim: int, itemsize: int):
    """(head_chunk, block_rows) that makes the packed path fit scoped VMEM.

    (0, 0)  → fully unrolled fits (the tuned headline path);
    (c, r)  → run with head_chunk=c (and block_rows=r override if nonzero);
    (-1, 0) → nothing fits, use the merged-head entry point.

    Two chip-measured constraints (round 5, lp=256 sweep):
    - the chunk's lane width c·head_dim must be a multiple of 128 (Mosaic
      block divisibility) — hd=64 can never chunk below pairs;
    - VMEM: chunks at the usual ≥8-row budget are safe; a HALF-budget
      chunk (budget ≥ 4) still compiles at a forced 8-row block because
      each grid step carries only that chunk's temporaries (measured:
      lp=256 c=1 hd=128 compiles and runs 24% faster than merged-head;
      c=2 at the same lp — 2× the live tiles — is a compile-time OOM)."""
    if _packed_block_budget(lp, num_heads, itemsize) >= 8:
        return 0, 0
    for c in range(num_heads - 1, 0, -1):
        if num_heads % c or (c * head_dim) % 128:
            continue
        budget = _packed_block_budget(lp, c, itemsize)
        if budget >= 8:
            return c, 0
        if budget >= 4:
            return c, 8
    return -1, 0


def _pick_block_b_packed(
    b: int, lp: int, num_heads: int, itemsize: int, block_rows: int = 0
) -> int:
    """Callers pad b UP to a multiple of the returned block (b_pad) — the
    budgeted block size is kept even for awkward batch sizes rather than
    collapsing toward 1-row grid steps."""
    blk = block_rows or max(1, min(128, _packed_block_budget(lp, num_heads, itemsize)))
    return min(blk, -(-b // 8) * 8)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _attention_core_packed(q, k, v, bias, seed, scale, causal, rate,
                           num_heads, interpret, block_rows=0, head_chunk=0):
    out, _ = _attention_core_packed_fwd(
        q, k, v, bias, seed, scale, causal, rate, num_heads, interpret,
        block_rows, head_chunk
    )
    return out


def _packed_specs(blk, lp, d, num_heads, head_chunk):
    """(grid-tail, q/k/v spec, bias spec, kernel head args).

    ``head_chunk`` < num_heads puts the head axis on the grid: each step's
    block covers ``head_chunk`` heads' lane slice ([blk, lp, chunk·hd] via
    index_map on the feature axis), so only that many f32 score tiles are
    ever live — the lever that fits lp=256×H=4 inside scoped VMEM."""
    if head_chunk and head_chunk < num_heads:
        d_chunk = (d // num_heads) * head_chunk
        spec3 = pl.BlockSpec(
            (blk, lp, d_chunk), lambda i, hi, _seed: (i, 0, hi),
            memory_space=pltpu.VMEM,
        )
        spec_bias = pl.BlockSpec(
            (blk, lp), lambda i, hi, _seed: (i, 0), memory_space=pltpu.VMEM
        )
        return (num_heads // head_chunk,), spec3, spec_bias, {
            "num_heads": head_chunk, "total_heads": num_heads,
        }
    spec3 = pl.BlockSpec(
        (blk, lp, d), lambda i, _seed: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_bias = pl.BlockSpec(
        (blk, lp), lambda i, _seed: (i, 0), memory_space=pltpu.VMEM
    )
    return (), spec3, spec_bias, {"num_heads": num_heads}


def _attention_core_packed_fwd(q, k, v, bias, seed, scale, causal, rate,
                               num_heads, interpret, block_rows=0,
                               head_chunk=0):
    b, lp, d = q.shape
    heads_eff = head_chunk if head_chunk and head_chunk < num_heads else num_heads
    blk = _pick_block_b_packed(b, lp, heads_eff, q.dtype.itemsize, block_rows)
    grid_tail, spec3, spec_bias, head_args = _packed_specs(
        blk, lp, d, num_heads, head_chunk
    )
    grid = (b // blk, *grid_tail)
    hd = d // num_heads
    out = pl.pallas_call(
        partial(_attn_fwd_kernel_packed, scale=scale, causal=causal,
                rate=rate, **head_args),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec3, spec3, spec3, spec_bias],
            out_specs=spec3,
        ),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), v.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * lp * lp * hd,
            bytes_accessed=4 * b * lp * d * q.dtype.itemsize,
            transcendentals=b * num_heads * lp * lp,
        ),
    )(seed, q, k, v, bias)
    return out, (q, k, v, bias, seed)


def _attention_core_packed_bwd(scale, causal, rate, num_heads, interpret,
                               block_rows, head_chunk, residuals, do):
    q, k, v, bias, seed = residuals
    b, lp, d = q.shape
    heads_eff = head_chunk if head_chunk and head_chunk < num_heads else num_heads
    blk = _pick_block_b_packed(b, lp, heads_eff, q.dtype.itemsize, block_rows)
    grid_tail, spec3, spec_bias, head_args = _packed_specs(
        blk, lp, d, num_heads, head_chunk
    )
    grid = (b // blk, *grid_tail)
    hd = d // num_heads
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel_packed, scale=scale, causal=causal,
                rate=rate, **head_args),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec3, spec3, spec3, spec_bias, spec3],
            out_specs=[spec3, spec3, spec3],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, d), q.dtype),
            jax.ShapeDtypeStruct((b, lp, d), k.dtype),
            jax.ShapeDtypeStruct((b, lp, d), v.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * lp * lp * hd,
            bytes_accessed=7 * b * lp * d * q.dtype.itemsize,
            transcendentals=b * num_heads * lp * lp,
        ),
    )(seed, q, k, v, bias, do.astype(v.dtype))
    return dq, dk, dv, jnp.zeros_like(bias), None


_attention_core_packed.defvjp(_attention_core_packed_fwd, _attention_core_packed_bwd)


def _seed_from_key(dropout_key) -> jnp.ndarray:
    """Scalar int32 seed from the KEY DATA (deterministic across
    compilations — rbg bit GENERATION may differ between compilations of
    the same program, jax PRNG docs), XOR-folded."""
    data = jax.random.key_data(dropout_key).astype(jnp.uint32).reshape(-1)
    return jax.lax.reduce(
        data, jnp.uint32(0), jax.lax.bitwise_xor, (0,)
    ).astype(jnp.int32)[None]


def fused_attention_packed(
    q: jnp.ndarray,  # [B, L, D]  (D = H·hd, head-major)
    k: jnp.ndarray,  # [B, L, D]
    v: jnp.ndarray,  # [B, L, D]
    key_bias: jnp.ndarray,  # [B, L] additive f32 (0 = attend, NEG = masked)
    *,
    num_heads: int,
    causal: bool,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_key=None,
    interpret: bool = False,
    block_rows: int = 0,
    head_chunk: int = 0,
) -> jnp.ndarray:
    """:func:`fused_attention` on the PACKED [B, L, H·hd] layout — the
    natural output of the q/k/v projections — with a static in-kernel head
    loop over lane slices.

    Against the [B·H, L, hd] entry point this removes the four
    [B,L,H,hd]↔[B·H,L,hd] transposes and the per-head key-bias repeat the
    caller otherwise pays per attention layer (the round-4 step profile's
    'layout' slice): q/k/v/o move through HBM exactly once, in the layout
    the surrounding GEMMs already use.  Dropout masks are bitwise the same
    noise the merged-head kernel draws for the same key.

    ``head_chunk`` (a divisor of ``num_heads``, 0 = all) moves the head
    loop onto the grid: each grid step touches only that many heads' lane
    slice, shrinking live score tiles by H/chunk — this is what lets the
    transpose-free path cover long-sequence × many-head shapes (lp=256,
    H=4) that blow scoped VMEM fully unrolled.  ``auto_head_chunk`` picks
    it."""
    b, length, d = q.shape
    if d % num_heads:
        msg = f"model dim {d} not divisible by num_heads {num_heads}"
        raise ValueError(msg)
    if head_chunk and num_heads % head_chunk:
        msg = f"head_chunk {head_chunk} must divide num_heads {num_heads}"
        raise ValueError(msg)
    lp = _round_up(length, 64)
    heads_eff = head_chunk if head_chunk and head_chunk < num_heads else num_heads
    blk = _pick_block_b_packed(b, lp, heads_eff, q.dtype.itemsize, block_rows)
    b_pad = _round_up(b, blk)
    rate = float(dropout_rate)

    def pad3(x):
        return jnp.pad(x, ((0, b_pad - b), (0, lp - length), (0, 0)))

    qp, kp, vp = pad3(q), pad3(k), pad3(v)
    bias = jnp.pad(
        key_bias.astype(jnp.float32),
        ((0, b_pad - b), (0, lp - length)),
        constant_values=NEG_INF,
    )
    if rate > 0.0:
        if dropout_key is None:
            msg = "dropout_rate > 0 requires dropout_key"
            raise ValueError(msg)
        seed = _seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _attention_core_packed(
        qp, kp, vp, bias, seed, scale, causal, rate, num_heads, interpret,
        block_rows, head_chunk
    )
    return out[:b, :length, :]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attention_core(q, k, v, bias, seed, scale, causal, rate, interpret):
    out, _ = _attention_core_fwd(q, k, v, bias, seed, scale, causal, rate, interpret)
    return out


def _attention_core_fwd(q, k, v, bias, seed, scale, causal, rate, interpret):
    bh, lp, hd = q.shape
    blk = _pick_block_bh(bh, lp, q.dtype.itemsize)
    grid = (bh // blk,)
    spec3 = pl.BlockSpec(
        (blk, lp, hd), lambda i, _seed: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_bias = pl.BlockSpec(
        (blk, lp), lambda i, _seed: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_attn_fwd_kernel, scale=scale, causal=causal, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec3, spec3, spec3, spec_bias],
            out_specs=spec3,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, lp, hd), v.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lp * lp * hd,
            bytes_accessed=4 * bh * lp * hd * q.dtype.itemsize,
            transcendentals=bh * lp * lp,
        ),
    )(seed, q, k, v, bias)
    return out, (q, k, v, bias, seed)


def _attention_core_bwd(scale, causal, rate, interpret, residuals, do):
    q, k, v, bias, seed = residuals
    bh, lp, hd = q.shape
    blk = _pick_block_bh(bh, lp, q.dtype.itemsize)
    grid = (bh // blk,)
    spec3 = pl.BlockSpec(
        (blk, lp, hd), lambda i, _seed: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_bias = pl.BlockSpec(
        (blk, lp), lambda i, _seed: (i, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, scale=scale, causal=causal, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec3, spec3, spec3, spec_bias, spec3],
            out_specs=[spec3, spec3, spec3],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lp, hd), q.dtype),
            jax.ShapeDtypeStruct((bh, lp, hd), k.dtype),
            jax.ShapeDtypeStruct((bh, lp, hd), v.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * lp * lp * hd,
            bytes_accessed=7 * bh * lp * hd * q.dtype.itemsize,
            transcendentals=bh * lp * lp,
        ),
    )(seed, q, k, v, bias, do.astype(v.dtype))
    return dq, dk, dv, jnp.zeros_like(bias), None


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def fused_attention(
    q: jnp.ndarray,  # [BH, L, hd]
    k: jnp.ndarray,  # [BH, L, hd]
    v: jnp.ndarray,  # [BH, L, hd]
    key_bias: jnp.ndarray,  # [BH, L] additive f32 (0 = attend, NEG = masked)
    *,
    causal: bool,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_key=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale + bias [+ causal]) [→ dropout] · v, fused.

    Heads are pre-merged into the leading dim ([B·H, L, hd] — the layout the
    XLA path already uses).  L is padded to a multiple of 64 internally;
    padded KEY lanes are masked via ``key_bias``, padded QUERY rows produce
    sliced-off garbage (their upstream gradient is exactly zero because no
    real output attends to them).

    :param dropout_rate: attention-weight dropout (reference torch
        MultiheadAttention semantics).  Mask bits come from a counter-based
        hash of (seed derived from ``dropout_key``, global element index) —
        reproducible for a fixed key, regenerated identically in the
        backward pass, portable across backends.
    """
    bh, length, hd = q.shape
    lp = _round_up(length, 64)
    blk = _pick_block_bh(bh, lp, q.dtype.itemsize)
    bh_pad = _round_up(bh, blk)
    rate = float(dropout_rate)

    def pad3(x):
        return jnp.pad(x, ((0, bh_pad - bh), (0, lp - length), (0, 0)))

    qp, kp, vp = pad3(q), pad3(k), pad3(v)
    bias = jnp.pad(
        key_bias.astype(jnp.float32),
        ((0, bh_pad - bh), (0, lp - length)),
        constant_values=NEG_INF,
    )
    if rate > 0.0:
        if dropout_key is None:
            msg = "dropout_rate > 0 requires dropout_key"
            raise ValueError(msg)
        seed = _seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _attention_core(qp, kp, vp, bias, seed, scale, causal, rate, interpret)
    return out[:bh, :length, :]


def attention_reference(q, k, v, key_bias, *, causal, scale):
    """Pure-XLA reference of the fused kernel's math (no dropout) for
    parity tests."""
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    s = s + key_bias[:, None, :].astype(jnp.float32)
    if causal:
        length = q.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
        s = jnp.where((col <= row)[None], s, NEG_INF)
    s = jnp.maximum(s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)
