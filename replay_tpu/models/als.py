"""Alternating Least Squares matrix factorization.

TPU-native replacement for the reference's Spark ML ALS wrapper (reference:
replay/models/als.py:16 ALSWrap; distributed solves in
scala/.../ReplayALS.scala).  Instead of Spark's block-partitioned normal
equations, each half-sweep is a BATCHED least-squares solve on device:
users are grouped into fixed-size blocks, their observed items gathered
into padded [B, M] index/confidence arrays, and the per-user normal
matrices are built with one masked einsum — MXU-shaped, jit-compiled once
per (B, M) bucket.

Implicit mode follows Hu-Koren-Volinsky: confidence c = 1 + alpha·r,
A_u = YᵀY + Σ_j alpha·r_uj·y_j y_jᵀ + reg·I (the YᵀY trick — only observed
items contribute the correction term).  Explicit mode solves only over
observed items with per-user reg·nnz damping (Spark ML semantics).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix

from replay_tpu.ann.mixin import ANNMixin
from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import ItemVectorModel, Recommender

_search_space = {
    "rank": {"type": "loguniform_int", "args": [8, 256]},
}


@partial(jax.jit, static_argnames=("implicit",))
def _solve_block(
    factors_other: jnp.ndarray,  # [N_other, r]
    gram: jnp.ndarray,  # [r, r] YᵀY (implicit) or zeros (explicit)
    idx: jnp.ndarray,  # [B, M] observed other-side indices (padded 0)
    rating: jnp.ndarray,  # [B, M] ratings (padded 0)
    mask: jnp.ndarray,  # [B, M] validity
    reg: jnp.ndarray,
    alpha: jnp.ndarray,
    implicit: bool,
) -> jnp.ndarray:
    rank = factors_other.shape[1]
    y = jnp.take(factors_other, idx, axis=0)  # [B, M, r]
    y = y * mask[..., None]
    if implicit:
        conf_minus_1 = alpha * rating * mask
        # A_u = YtY + Σ c' y yᵀ ;  b_u = Σ (1 + c') y
        corr = jnp.einsum("bm,bmr,bms->brs", conf_minus_1, y, y)
        a = gram[None] + corr + reg * jnp.eye(rank)[None]
        b = jnp.einsum("bm,bmr->br", (1.0 + conf_minus_1) * mask, y)
    else:
        a = jnp.einsum("bmr,bms->brs", y, y)
        nnz = jnp.sum(mask, axis=1)
        a = a + (reg * jnp.maximum(nnz, 1.0))[:, None, None] * jnp.eye(rank)[None]
        b = jnp.einsum("bm,bmr->br", rating * mask, y)
    return jnp.linalg.solve(a, b[..., None])[..., 0]


def _padded_rows(mat: csr_matrix, block: int, pad_multiple: int = 32):
    """(row_ids, idx [B, M], val [B, M], mask [B, M]) padded blocks.

    Rows are SORTED BY NNZ before blocking, so each block's pad width M is
    close to its rows' true lengths — under power-law interaction counts
    this cuts the batched-solve FLOPs by orders of magnitude vs. padding
    every block to the global maximum.  ``row_ids`` maps block rows back to
    original entities.  The sparsity pattern is constant across ALS sweeps,
    so callers build these ONCE per side and reuse them every iteration.
    """
    def round_m(x: int) -> int:
        # power-of-two pad widths → few distinct block shapes → few compiles
        return max(pad_multiple, 1 << (max(x, 1) - 1).bit_length())

    n = mat.shape[0]
    nnz_all = np.diff(mat.indptr)
    order = np.argsort(nnz_all, kind="stable")
    # cap B·M per block: heavy power-law entities land in narrow blocks
    # instead of inflating every row's pad width (the [n_items, max_users]
    # gather would otherwise materialize gigabytes)
    cell_budget = 1 << 22
    out = []
    start = 0
    while start < n:
        end = start + 1
        m = round_m(int(nnz_all[order[start]]))
        while end < n and (end - start) < block:
            cand_m = max(m, round_m(int(nnz_all[order[end]])))
            if (end - start + 1) * cand_m > cell_budget:
                break
            m = cand_m
            end += 1
        rows = order[start:end]
        nnz = nnz_all[rows]
        col = np.arange(m)
        src = mat.indptr[rows][:, None] + col[None, :]
        valid = col[None, :] < nnz[:, None]
        src_safe = np.minimum(src, max(len(mat.indices) - 1, 0))
        idx = np.where(valid, mat.indices[src_safe], 0).astype(np.int32)
        val = np.where(valid, mat.data[src_safe], 0.0).astype(np.float32)
        msk = valid.astype(np.float32)
        out.append((rows, idx, val, msk))
        start = end
    return out


class ALSWrap(ANNMixin, Recommender, ItemVectorModel):
    """ALS matrix factorization (implicit by default, as the reference)."""

    can_predict_cold_queries = False
    can_predict_cold_items = False
    _search_space = _search_space

    def __init__(
        self,
        rank: int = 10,
        implicit_prefs: bool = True,
        seed: Optional[int] = None,
        num_iterations: int = 10,
        regularization: float = 0.1,
        alpha: float = 1.0,
        block_size: int = 4096,
        index_builder=None,
    ):
        self.index_builder = index_builder
        self.rank = rank
        self.implicit_prefs = implicit_prefs
        self._seed = seed
        self.num_iterations = num_iterations
        self.regularization = regularization
        self.alpha = alpha
        self.block_size = block_size
        self.query_factors: Optional[np.ndarray] = None
        self.item_factors: Optional[np.ndarray] = None

    @property
    def _init_args(self):
        return {
            "rank": self.rank,
            "implicit_prefs": self.implicit_prefs,
            "seed": self._seed,
            "num_iterations": self.num_iterations,
            "regularization": self.regularization,
            "alpha": self.alpha,
            "block_size": self.block_size,
            "index_builder": None,
        }

    @property
    def _dataframes(self):
        import pandas as pd

        return {
            "query_factors": pd.DataFrame(self.query_factors),
            "item_factors": pd.DataFrame(self.item_factors),
        }

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        q = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy())
        i = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy())
        if self.rating_column in inter.columns:
            r = inter[self.rating_column].to_numpy(dtype=np.float32)
        else:
            r = np.ones(len(inter), dtype=np.float32)
        n_q, n_i = len(self.fit_queries), len(self.fit_items)
        mat = csr_matrix((r, (q, i)), shape=(n_q, n_i))
        mat_t = mat.T.tocsr()

        rng = np.random.default_rng(self._seed)
        scale = 1.0 / np.sqrt(self.rank)
        u = rng.normal(0, scale, (n_q, self.rank)).astype(np.float32)
        v = rng.normal(0, scale, (n_i, self.rank)).astype(np.float32)
        reg = jnp.float32(self.regularization)
        alpha = jnp.float32(self.alpha)

        # padded observation blocks are sparsity-pattern-only → build once
        # and upload once (reused by every sweep)
        to_dev = lambda blocks: [  # noqa: E731
            (rows, jnp.asarray(idx), jnp.asarray(val), jnp.asarray(msk))
            for rows, idx, val, msk in blocks
        ]
        q_blocks = to_dev(_padded_rows(mat, self.block_size))
        i_blocks = to_dev(_padded_rows(mat_t, self.block_size))
        u = jnp.asarray(u)
        v = jnp.asarray(v)
        for _ in range(self.num_iterations):
            u = self._half_sweep(q_blocks, mat.shape[0], v, reg, alpha)
            v = self._half_sweep(i_blocks, mat_t.shape[0], u, reg, alpha)
        self.query_factors, self.item_factors = np.asarray(u), np.asarray(v)
        if self.ann_enabled:
            self._build_ann_index()

    def _half_sweep(self, blocks, n_rows: int, other_dev, reg, alpha):
        if self.implicit_prefs:
            gram = jnp.dot(other_dev.T, other_dev, preferred_element_type=jnp.float32)
        else:
            gram = jnp.zeros((self.rank, self.rank), dtype=jnp.float32)
        out = jnp.zeros((n_rows, self.rank), dtype=jnp.float32)
        for rows, idx, val, msk in blocks:
            sol = _solve_block(
                other_dev, gram, idx, val, msk, reg, alpha, self.implicit_prefs
            )
            out = out.at[jnp.asarray(rows)].set(sol)
        return out

    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        # ANN path (reference ANNMixin._predict_wrap contract) only when
        # scoring the full fitted catalog — subsets fall back to exact
        if self.ann_enabled and len(items) == len(self.fit_items):
            q_pos = np.searchsorted(self.fit_queries, queries)
            qv = self.query_factors[q_pos]
            seen_lists = None
            if filter_seen_items and dataset is not None:
                inter = dataset.interactions
                grouped = inter.groupby(self.query_column)[self.item_column].agg(list)
                seen_lists = [grouped.get(q, []) for q in queries]
            return self._ann_predict(qv, queries, k, seen_lists)
        return super()._predict(dataset, k, queries, items, filter_seen_items)

    # -- scoring ------------------------------------------------------------
    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        q_pos = np.searchsorted(self.fit_queries, query_ids)
        i_pos = np.searchsorted(self.fit_items, item_ids)
        u = jnp.asarray(self.query_factors[q_pos])
        v = jnp.asarray(self.item_factors[i_pos])
        return np.asarray(
            jnp.dot(u, v.T, preferred_element_type=jnp.float32)
        )

    # -- item vectors (ItemVectorModel contract) ----------------------------
    def _get_item_vectors(self) -> np.ndarray:
        return self.item_factors
