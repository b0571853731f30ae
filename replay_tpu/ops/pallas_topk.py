"""Pallas fused full-catalog scoring + top-k.

The serving hot loop (reference: torch.topk over full-catalog logits,
replay/nn/lightning/callback/predictions_callback.py:80 and Spark window
sort get_top_k_recs, replay/utils/spark_utils.py:156) is, on TPU, one GEMM
followed by a top-k.  Done naively, XLA materializes the [B, N] logits in
HBM — at catalog sizes of 10⁶+ that is gigabytes of HBM traffic per batch
and becomes the bandwidth bottleneck.

This kernel streams the item table through VMEM in [block_n, D] tiles:
each grid step computes Q·Wᵀ for one tile on the MXU and reduces it to the
tile's top-k (iterative masked argmax on the VPU — k is small, sorting
networks are unnecessary), writing only [B, grid, k] back to HBM.  A final
cheap ``lax.top_k`` over the per-tile candidates (grid·k ≪ N) yields the
exact global result.  HBM traffic drops from O(B·N) to O(N·D + B·grid·k).

Seen-item filtering composes by masking AFTER the global merge only when
k_extra ≥ max seen per user — callers use ``k + max_seen`` candidates, the
reference's over-generation contract (replay/models/base_rec.py:152-201) —
or by passing a per-tile additive bias.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: pallas kernels cannot capture traced constants


def _topk_tile_kernel(
    q_ref, w_ref, vals_ref, idx_ref, *, k: int, block_n: int, n: int
):
    """One grid step: scores = q @ w_tileᵀ → per-tile top-k."""
    tile = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, block_n]
    base = tile * block_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    # Zero-padded catalog rows score 0, which would displace real items
    # with negative scores from the per-tile top-k before the global
    # merge (the post-merge idx<n mask cannot restore them). Mask them
    # to NEG_INF here; n is a trace-time Python int.
    scores = jnp.where(col_ids + base < n, scores, NEG_INF)

    b = scores.shape[0]
    # candidate slot padded to the 128-lane tile width; only the first k
    # entries are filled, the rest stay at NEG_INF and vanish in the merge
    kpad = vals_ref.shape[1]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (b, kpad), dimension=1)

    def select_one(i, carry):
        scores_c, vals, idxs = carry
        best = jnp.max(scores_c, axis=1)  # [B]
        best_col = jnp.argmax(scores_c, axis=1).astype(jnp.int32)  # [B]
        # slot write as a lane-select (Mosaic has no dynamic_update_slice)
        at_slot = slot_ids == i
        vals = jnp.where(at_slot, best[:, None], vals)
        idxs = jnp.where(at_slot, (best_col + base)[:, None], idxs)
        # mask the selected column per row
        hit = col_ids == best_col[:, None]
        scores_c = jnp.where(hit, NEG_INF, scores_c)
        return scores_c, vals, idxs

    vals0 = jnp.full((b, kpad), NEG_INF, dtype=jnp.float32)
    idxs0 = jnp.zeros((b, kpad), dtype=jnp.int32)
    _, vals, idxs = jax.lax.fori_loop(0, k, select_one, (scores, vals0, idxs0))
    vals_ref[:] = vals
    idx_ref[:] = idxs


def _cmpex_roll(vals, idxs, d: int, desc_mask):
    """One bitonic compare-exchange at lane distance ``d`` on flat
    [b, width] arrays.  Partners are fetched with static lane rolls (the
    only lane-permutation Mosaic lowers — no ``rev``, no >2-D reshapes);
    pair (i, i^d) never crosses a roll wrap because wrap positions are
    never selected (position i<d has bit d clear and reads i+d; position
    i≥width-d has bit d set and reads i-d).

    ``desc_mask`` is an int32 0/1 array (or scalar) broadcastable to
    [b, width]: 1 where the enclosing block sorts DESCENDING.  The element
    at the bit-clear (lower) position of a pair keeps the max iff
    descending.  All mask algebra stays int32 with one final comparison —
    Mosaic cannot lower bool-on-bool selects/xors (i8→i1 truncation)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    upper01 = (lane & d) // d  # 1 at the upper position of each pair
    upper = upper01 == 1
    part_v = jnp.where(upper, jnp.roll(vals, d, axis=1), jnp.roll(vals, -d, axis=1))
    part_i = jnp.where(upper, jnp.roll(idxs, d, axis=1), jnp.roll(idxs, -d, axis=1))
    # xor: lower&desc → max, upper&desc → min
    want01 = (upper01 + desc_mask) & 1
    gt = (part_v > vals).astype(jnp.int32)
    lt = (part_v < vals).astype(jnp.int32)
    take = (want01 * gt + (1 - want01) * lt) == 1
    return jnp.where(take, part_v, vals), jnp.where(take, part_i, idxs)


def _topk_tile_kernel_bitonic(
    q_ref, w_ref, vals_ref, idx_ref, idx_scratch, *, block_n: int, n: int,
    seg: int = 128
):
    """Per-tile top-``seg`` via a bitonic tournament, O(log²·) vector stages
    instead of the iterative kernel's O(k) argmax passes — the k>32 regime
    where iterative selection loses to XLA.

    Everything stays a flat [b, block_n] vector (Mosaic cannot shape-cast
    the lane axis): (1) bitonic-sort every ``seg``-lane segment, direction
    ALTERNATING by segment index so adjacent (desc, asc) pairs form bitonic
    sequences; (2) tournament-merge segment pairs in place — the elementwise
    pairwise max IS the first merge stage, the winners keep living in the
    lower segment, losers' lanes compute garbage that is never read; after
    level ℓ the live segments sit at indices ≡ 0 (mod 2^ℓ), cleaned toward
    a direction alternating by live rank.  The final top-``seg`` lands
    descending-sorted in lanes [0, seg)."""
    tile = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, block_n]
    base = tile * block_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    scores = jnp.where(col_ids + base < n, scores, NEG_INF)
    # Mosaic crashes rolling lazy-layout iota-derived vectors at >8 sublane
    # rows; a VMEM round-trip materializes the index payload in a native
    # layout (the un-rolled mask iotas below are fine as lazy values).
    idx_scratch[:] = col_ids + base
    vals, idxs = scores, idx_scratch[:]
    lane = col_ids  # lane position within the flat tile

    # --- phase 1: sort each seg-lane segment, direction (seg_idx % 2 == 0)
    q_in_seg = lane % seg
    seg_idx = lane // seg
    s = 2
    while s <= seg:
        # block direction at stage s, folded with the segment's target
        # direction: desc ⇔ (in-segment stage block + segment index) even
        desc01 = 1 - ((q_in_seg // s + seg_idx) & 1)
        d = s >> 1
        while d >= 1:
            vals, idxs = _cmpex_roll(vals, idxs, d, desc01)
            d >>= 1
        s <<= 1

    # --- phase 2: tournament merge, live segments at multiples of 2^level
    n_seg = block_n // seg
    level = 1
    while (1 << level) <= n_seg:
        # first merge stage: compare across the pair distance — winners
        # (top-seg multiset of the bitonic desc|asc concatenation) collect
        # in the lower segment as an elementwise max
        vals, idxs = _cmpex_roll(vals, idxs, (1 << (level - 1)) * seg, 1)
        # clean toward direction alternating by live rank (seg_idx >> level)
        desc01 = 1 - ((seg_idx >> level) & 1)
        d = seg >> 1
        while d >= 1:
            vals, idxs = _cmpex_roll(vals, idxs, d, desc01)
            d >>= 1
        level += 1

    vals_ref[:] = vals[:, :seg]
    idx_ref[:] = idxs[:, :seg]


@partial(jax.jit, static_argnames=("k", "block_n", "block_b", "interpret", "method"))
def fused_topk(
    queries: jnp.ndarray,  # [B, D]
    items: jnp.ndarray,  # [N, D]
    k: int,
    block_n: int = 4096,
    block_b: int = 256,
    interpret: bool = False,
    method: str = "auto",
):
    """Exact top-k of Q·Wᵀ without materializing [B, N] in HBM.

    Grid is (B/block_b, N/block_n): the scores tile held in VMEM is
    [block_b, block_n] (f32), sized to fit alongside the double-buffered
    item tile within the ~16 MB VMEM budget.

    :param method: per-tile selection — ``iterative`` (O(k) masked argmax
        passes, best for small k), ``bitonic`` (sorting network, wins for
        k>32 up to 128), or ``auto``.
    :returns: (values [B, k] float32, indices [B, k] int32).
    """
    if method == "auto":
        method = "iterative" if k <= 32 else "bitonic"
    if method == "bitonic" and (
        k > 128 or block_n % 128 or (block_n // 128) & (block_n // 128 - 1)
    ):
        # bitonic path keeps one 128-lane segment and needs a power-of-two
        # segment count for the merge tree
        method = "iterative"
    b, d = queries.shape
    n = items.shape[0]
    if n % block_n:
        pad = block_n - n % block_n
        items = jnp.concatenate(
            [items, jnp.zeros((pad, d), dtype=items.dtype)], axis=0
        )
        # padding rows are dropped after the merge via the idx < n mask
        n_padded = n + pad
    else:
        n_padded = n
    block_b = min(block_b, b)
    if b % block_b:
        bpad = block_b - b % block_b
        queries = jnp.concatenate(
            [queries, jnp.zeros((bpad, d), dtype=queries.dtype)], axis=0
        )
        b_padded = b + bpad
    else:
        b_padded = b
    grid_b = b_padded // block_b
    grid_n = n_padded // block_n
    k_eff = min(k, block_n)
    kpad = max(128, -(-k_eff // 128) * 128)  # lane-aligned candidate slot

    if method == "bitonic":
        kernel = partial(_topk_tile_kernel_bitonic, block_n=block_n, n=n, seg=kpad)
        scratch = [pltpu.VMEM((block_b, block_n), jnp.int32)]
    else:
        kernel = partial(_topk_tile_kernel, k=k_eff, block_n=block_n, n=n)
        scratch = []
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(grid_b, grid_n),
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda bi, ni: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda bi, ni: (ni, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, kpad), lambda bi, ni: (bi, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, kpad), lambda bi, ni: (bi, ni), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_padded, grid_n * kpad), jnp.float32),
            jax.ShapeDtypeStruct((b_padded, grid_n * kpad), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_padded * n_padded * d,
            bytes_accessed=grid_b * n_padded * d * items.dtype.itemsize
            + b_padded * grid_n * kpad * 8,
            transcendentals=0,
        ),
    )(queries, items)
    vals = vals[:b]
    idxs = idxs[:b]

    # drop padded-row candidates, then merge the grid·k pool exactly
    valid = idxs < n
    vals = jnp.where(valid, vals, NEG_INF)
    top_vals, pool_pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    top_idx = jnp.take_along_axis(idxs, pool_pos, axis=1)
    return top_vals, top_idx


def topk_reference(queries, items, k):
    """XLA baseline: full logits then top_k (for tests/benchmarks)."""
    logits = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(logits, k)


def is_tpu() -> bool:
    return jax.default_backend() == "tpu"


_FUSED_BROKEN: set = set()


def auto_topk(queries, items, k, block_n: int = 4096, allow_bitonic: bool = False):
    """Dispatch: fused_topk (iterative in-tile selection) on TPU for k≤32,
    XLA dense path otherwise and on non-TPU backends (pallas CPU =
    interpret only).

    The bitonic variant (32<k≤128) is exact and wins its microbenchmarks,
    but on the current remote-compile toolchain its Mosaic compile can HANG
    rather than fail (observed 2026-08-19 round 3, any shape) — an
    exception guard cannot catch a hang, so it is opt-in via
    ``allow_bitonic`` until the toolchain moves; the serving default for
    k>32 is XLA's dense top-k.

    A Mosaic lowering FAILURE of a fused variant (toolchain drift)
    downgrades that variant to the XLA path once, instead of breaking the
    serving call site."""
    if is_tpu() and k <= (128 if allow_bitonic else 32):
        method = "iterative" if k <= 32 else "bitonic"
        if method not in _FUSED_BROKEN:
            try:
                return fused_topk(queries, items, k, block_n=block_n, method=method)
            except Exception:  # pragma: no cover - compiler-dependent
                _FUSED_BROKEN.add(method)
    return topk_reference(queries, items, k)
