"""Full-catalog scoring and top-k selection.

TPU-native replacement for the reference's per-query Spark window sorts
(reference: replay/utils/spark_utils.py:156 get_top_k_recs and
replay/models/base_rec.py:152-201 _filter_seen).  The design moves
filter-seen INTO the scoring kernel: seen items are masked to -inf on device
before top-k, so exactly k valid recommendations come back — no k+max_seen
over-generation round trip.

Tie-breaking: ``jax.lax.top_k`` prefers the lowest index on equal scores,
which matches the reference's ``orderBy(rating desc, item asc)`` when
candidate columns are sorted by item id ascending.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)


@partial(jax.jit, static_argnames=("k",))
def masked_topk(
    scores: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k per row with an optional invalidity mask.

    :param scores: [B, N] float scores.
    :param k: number of results per row.
    :param mask: [B, N] bool; True = exclude (e.g. seen items).
    :returns: (values [B, k], indices [B, k]) — masked entries get -inf.
    """
    if mask is not None:
        scores = jnp.where(mask, NEG_INF, scores)
    return jax.lax.top_k(scores, k)


def _seen_mask_for_block(
    seen_query_rows: np.ndarray,
    seen_item_cols: np.ndarray,
    block_rows: int,
    n_items: int,
) -> np.ndarray:
    """Dense [block_rows, n_items] bool mask from COO seen pairs (host side)."""
    mask = np.zeros((block_rows, n_items), dtype=bool)
    if len(seen_query_rows):
        mask[seen_query_rows, seen_item_cols] = True
    return mask


def topk_blockwise(
    score_fn,
    n_queries: int,
    n_items: int,
    k: int,
    block_size: int = 1024,
    seen_csr=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Blocked full-catalog top-k over all queries.

    :param score_fn: callable(block_start, block_rows) -> jnp [block_rows, n_items]
        scores for queries [block_start, block_start + block_rows).
    :param seen_csr: optional scipy CSR [n_queries, n_items]; nonzero = seen,
        masked out before top-k.
    :returns: (values [n_queries, k], indices [n_queries, k]) numpy arrays.
    """
    k_eff = min(k, n_items)
    out_vals = np.empty((n_queries, k_eff), dtype=np.float32)
    out_idx = np.empty((n_queries, k_eff), dtype=np.int64)
    for start in range(0, n_queries, block_size):
        rows = min(block_size, n_queries - start)
        scores = score_fn(start, rows)
        mask = None
        if seen_csr is not None:
            block = seen_csr[start : start + rows]
            coo = block.tocoo()
            mask = jnp.asarray(
                _seen_mask_for_block(coo.row, coo.col, rows, n_items)
            )
        vals, idx = masked_topk(jnp.asarray(scores), k_eff, mask)
        out_vals[start : start + rows] = np.asarray(vals, dtype=np.float32)
        out_idx[start : start + rows] = np.asarray(idx, dtype=np.int64)
    return out_vals, out_idx
