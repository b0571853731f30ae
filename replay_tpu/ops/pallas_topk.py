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
    n = items.shape[0]
    vals, idxs = _fused_topk_raw(
        queries, items, k, block_n, block_b, interpret, method=method
    )
    return _merge_pool(vals, idxs, n, k)


def _budget_for(k: int, grid_n: int, budget) -> int:
    """Per-tile candidate budget P for :func:`fused_topk_budget`.

    Needs ``grid_n * P >= k`` (the pool must be able to hold a full top-k)
    plus slack so the exactness certificate rarely trips: under a
    random-order catalog the count of global-top-k members per tile is
    ~Poisson(k / grid_n), so ``4·k/grid_n + 8`` puts the overflow
    probability astronomically low while keeping P ≪ k.
    """
    if budget is not None:
        p = int(budget)
    else:
        p = max(8, -(-4 * k // grid_n) + 8)
    p = max(p, -(-k // grid_n))  # pool must cover k
    p = min(p, 126)  # slot P+1 must fit the 128-lane candidate block
    if grid_n * p < k:
        return k  # pool cannot cover a top-k → caller takes the plain path
    return p


@partial(
    jax.jit,
    static_argnames=("k", "block_n", "block_b", "budget", "interpret", "fallback"),
)
def fused_topk_budget(
    queries: jnp.ndarray,  # [B, D]
    items: jnp.ndarray,  # [N, D]
    k: int,
    block_n: int = 4096,
    block_b: int = 256,
    budget: int = None,
    interpret: bool = False,
    fallback: str = "iterative",
):
    """Exact large-k top-k of Q·Wᵀ at small-k cost (reference serving hot
    loop: replay/nn/lightning/callback/predictions_callback.py:80,
    scala/.../ReplayALS.scala:417 blocked GEMM top-k).

    The iterative kernel's per-tile selection costs one masked-argmax pass
    per extracted candidate, so at k=100 it loses to XLA dense.  This
    wrapper runs the SAME proven kernel with a small per-tile budget
    ``P ≪ k`` (P+1 extraction passes) and restores exactness with a
    threshold certificate computed outside the kernel:

    - slot ``P`` of each tile's candidate block holds the (P+1)-th tile
      max — i.e. the max of everything the tile did NOT surface;
    - ``τ`` = k-th largest of the pooled candidates.  The pool trivially
      holds ≥ k elements ≥ τ, so if every tile's remaining max is < τ,
      every hidden element is < τ and the pool top-k is a valid exact
      top-k (values included);
    - otherwise a ``lax.cond`` falls back to the exact full-budget path
      (``fallback="iterative"``: the fused kernel with P=k;
      ``"dense"``: XLA dense logits + top_k).

    Under a random-order catalog the per-tile count of global top-k
    members is ~Poisson(k/grid) and the default budget makes the fallback
    probability negligible; adversarially clustered catalogs (e.g. sorted
    by popularity) still get the exact answer, just at fallback speed —
    pre-permuting the item table once restores the fast path.

    No new Mosaic patterns: this compiles exactly the kernel the k≤32
    serving path already uses (no rolls, no bitonic network), so the
    round-3 bitonic compile hang cannot recur here.

    :returns: (values [B, k] float32, indices [B, k] int32).
    """
    b, _ = queries.shape
    n = items.shape[0]
    grid_n = -(-n // block_n)
    p = _budget_for(k, grid_n, budget)
    if p >= k or grid_n == 1:
        # budget offers no saving — the plain kernel is already optimal
        return fused_topk(
            queries, items, k, block_n=block_n, block_b=block_b,
            interpret=interpret, method="iterative",
        )

    # kernel with k=P+1: slots [0, P) are the tile's top-P candidates in
    # order, slot P is the remaining max (the certificate input).  Skip
    # the wrapper's global merge by requesting the raw per-tile blocks.
    vals, idxs = _fused_topk_raw(
        queries, items, p + 1, block_n=block_n, block_b=block_b,
        interpret=interpret,
    )
    kpad = vals.shape[1] // grid_n
    vals3 = vals.reshape(b, grid_n, kpad)
    idx3 = idxs.reshape(b, grid_n, kpad)
    remaining = vals3[:, :, p]  # [B, grid_n]
    cand_vals = vals3[:, :, :p].reshape(b, grid_n * p)
    cand_idx = idx3[:, :, :p].reshape(b, grid_n * p)
    valid = cand_idx < n
    cand_vals = jnp.where(valid, cand_vals, NEG_INF)

    top_vals, pool_pos = jax.lax.top_k(cand_vals, k)
    top_idx = jnp.take_along_axis(cand_idx, pool_pos, axis=1)
    tau = top_vals[:, k - 1]  # [B]
    overflow = jnp.any(remaining >= tau[:, None])

    def exact_path(_):
        if fallback == "dense":
            v, i = topk_reference(queries, items, k)
        else:
            v, i = fused_topk(
                queries, items, k, block_n=block_n, block_b=block_b,
                interpret=interpret, method="iterative",
            )
        return v, i

    return jax.lax.cond(
        overflow, exact_path, lambda _: (top_vals, top_idx), operand=None
    )



def _merge_pool(vals, idxs, n, k):
    """Exact global merge of per-tile candidate pools: drop padded-row
    candidates, top-k over the [B, grid_n·kpad] pool."""
    valid = idxs < n
    vals = jnp.where(valid, vals, NEG_INF)
    top_vals, pool_pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    top_idx = jnp.take_along_axis(idxs, pool_pos, axis=1)
    return top_vals, top_idx


def _fused_topk_raw(queries, items, k, block_n, block_b, interpret,
                    method: str = "iterative"):
    """The fused kernel without the global merge: per-tile candidate
    blocks as [B, grid_n·kpad] (kpad = lane-padded k), padded catalog rows
    pre-masked to NEG_INF inside the kernel.  One copy of the
    padding/grid/pallas plumbing serves both per-tile selection methods
    and the budget kernel (review r4)."""
    b, d = queries.shape
    n = items.shape[0]
    if n % block_n:
        pad = block_n - n % block_n
        items = jnp.concatenate(
            [items, jnp.zeros((pad, d), dtype=items.dtype)], axis=0
        )
    n_padded = items.shape[0]
    block_b = min(block_b, b)
    if b % block_b:
        bpad = block_b - b % block_b
        queries = jnp.concatenate(
            [queries, jnp.zeros((bpad, d), dtype=queries.dtype)], axis=0
        )
    b_padded = queries.shape[0]
    grid_b = b_padded // block_b
    grid_n = n_padded // block_n
    k_eff = min(k, block_n)
    kpad = max(128, -(-k_eff // 128) * 128)

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
    return vals[:b], idxs[:b]


def topk_reference(queries, items, k):
    """XLA baseline: full logits then top_k (for tests/benchmarks)."""
    logits = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(logits, k)


def is_tpu() -> bool:
    return jax.default_backend() == "tpu"


_FUSED_BROKEN: set = set()


def auto_topk(queries, items, k, block_n: int = 4096, allow_bitonic: bool = False):
    """Dispatch the serving top-k:

    - k ≤ 32 on TPU → ``fused_topk`` (iterative in-tile selection);
    - 32 < k ≤ 512 on TPU → ``fused_topk_budget`` (small per-tile budget +
      exactness certificate; compiles the SAME kernel, so no new Mosaic
      exposure) when the catalog spans ≥ 4 tiles — below that the plain
      kernel/XLA dense is already optimal;
    - everything else (and non-TPU backends; pallas CPU = interpret only)
      → XLA dense logits + top_k.

    The bitonic variant is retained for study via ``allow_bitonic`` but is
    never the default: on the round-3 remote-compile toolchain its Mosaic
    compile HANGS rather than fails (any shape), and an exception guard
    cannot catch a hang.

    A Mosaic lowering FAILURE of a fused variant (toolchain drift)
    downgrades that variant to the XLA path once, instead of breaking the
    serving call site."""
    if is_tpu() and allow_bitonic and 32 < k <= 128 and "bitonic" not in _FUSED_BROKEN:
        try:
            return fused_topk(queries, items, k, block_n=block_n, method="bitonic")
        except Exception:  # pragma: no cover - compiler-dependent
            _FUSED_BROKEN.add("bitonic")
    if is_tpu() and k <= 32 and "iterative" not in _FUSED_BROKEN:
        try:
            return fused_topk(queries, items, k, block_n=block_n, method="iterative")
        except Exception:  # pragma: no cover - compiler-dependent
            _FUSED_BROKEN.add("iterative")
    if (
        is_tpu()
        and 32 < k <= 512
        and items.shape[0] >= 4 * block_n
        and "iterative" not in _FUSED_BROKEN
    ):
        try:
            return fused_topk_budget(queries, items, k, block_n=block_n)
        except Exception:  # pragma: no cover - compiler-dependent
            _FUSED_BROKEN.add("iterative")
    return topk_reference(queries, items, k)
