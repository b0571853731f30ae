"""SLIM: Sparse Linear Methods (Ning & Karypis, ICDM 2011).

TPU-native replacement for the reference SLIM (reference:
replay/models/slim.py:20), which fits one sklearn ElasticNet per item column
inside a Spark pandas_udf.  The objective per item column j is

    w*_j = argmin_{w≥0, w_j=0}  1/(2n)‖r_j − R w‖² + λ₁‖w‖₁ + λ₂/2‖w‖²

with the sklearn parametrization ``alpha = beta + lambda_``, ``l1_ratio =
lambda_ / alpha`` (so λ₁ = lambda_, λ₂ = beta; reference slim.py:93-104).

Solver: **exact active-set screening + batched FISTA on the MXU.**  With
nonnegative ratings and the positivity constraint, the gradient of the
smooth part at any feasible w satisfies grad_k ≥ −G_kj/n (G = RᵀR has no
negative entries), so coordinate k can never activate unless
``G_kj / n > λ₁`` — a *sufficient and necessary* screen, not a heuristic.
Column supports shrink from n_items to the few dozen items that actually
co-occur strongly, and each column becomes a tiny [s_j, s_j] problem.
Columns are grouped into padded size tiers and solved as batched
[C, S, S] × [C, S] FISTA iterations (vmapped GEMMs on the MXU; masked
lanes stay at zero).  The screened solution extended by zeros satisfies
the full KKT conditions, so the result equals the whole-catalog optimum.

Negative ratings invalidate the screen; those fits fall back to the
whole-Gram dense FISTA (same fixed point, more FLOPs).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_neighbour_rec import NeighbourRec

_search_space = {
    "beta": {"type": "loguniform", "args": [1e-6, 5]},
    "lambda_": {"type": "loguniform", "args": [1e-6, 2]},
}

# n_items up to which the Gram matrix is materialized dense for submatrix
# gathers (16k² f32 = 1 GB); beyond that, sparse element gathers are used
_DENSE_GRAM_MAX = 16384


@jax.jit
def _fista_step(w, z, t, gram_n, l1, l2, step, diag_mask):
    grad = jnp.dot(gram_n, z, preferred_element_type=jnp.float32) - gram_n + l2 * z
    w_next = z - step * grad
    # soft-threshold + positivity projection (sklearn positive=True)
    w_next = jnp.maximum(w_next - step * l1, 0.0)
    w_next = w_next * diag_mask
    t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
    z_next = w_next + ((t - 1.0) / t_next) * (w_next - w)
    return w_next, z_next, t_next


@partial(jax.jit, static_argnames=("iters",))
def _bucket_lipschitz(gsub, valid, iters: int = 15):
    """Batched power iteration: max eigenvalue of each [S, S] block."""
    c, s = valid.shape
    v = valid / jnp.maximum(jnp.sqrt(jnp.sum(valid, axis=1, keepdims=True)), 1.0)

    def body(_, v):
        v = jnp.einsum("cab,cb->ca", gsub, v, preferred_element_type=jnp.float32)
        v = v * valid
        norm = jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        return v / norm

    v = jax.lax.fori_loop(0, iters, body, v)
    gv = jnp.einsum("cab,cb->ca", gsub, v, preferred_element_type=jnp.float32)
    return jnp.sum(v * gv, axis=1)  # [C]


@partial(jax.jit, static_argnames=("iters",))
def _bucket_fista(w, z, t, gsub_n, rhs_n, valid, l1, l2, step, iters: int):
    """``iters`` batched FISTA steps on [C, S] columns (masked lanes inert)."""

    def body(_, carry):
        w, z, t = carry
        grad = (
            jnp.einsum("cab,cb->ca", gsub_n, z, preferred_element_type=jnp.float32)
            - rhs_n
            + l2 * z
        )
        w_next = jnp.maximum(z - step[:, None] * (grad + l1), 0.0) * valid
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        z_next = w_next + ((t - 1.0) / t_next)[:, None] * (w_next - w)
        return w_next, z_next, t_next

    return jax.lax.fori_loop(0, iters, body, (w, z, t))


class SLIM(NeighbourRec):
    """Sparse linear item-item model with ElasticNet regularization."""

    _search_space = _search_space

    def __init__(
        self,
        beta: float = 0.01,
        lambda_: float = 0.01,
        seed: Optional[int] = None,
        max_iter: int = 300,
        tol: float = 1e-5,
        index_builder=None,
        allow_collect_to_master: bool = False,  # noqa: ARG002 — reference Spark
        # knob (replay/models/slim.py:20); the fit is already host-local here
    ):
        if beta < 0 or lambda_ <= 0:
            msg = "Invalid regularization parameters"
            raise ValueError(msg)
        self.beta = beta
        self.lambda_ = lambda_
        self.seed = seed
        self.max_iter = max_iter
        self.tol = tol
        self.index_builder = index_builder

    @property
    def _init_args(self):
        return {
            "beta": self.beta,
            "lambda_": self.lambda_,
            "seed": self.seed,
            "max_iter": self.max_iter,
            "tol": self.tol,
            "index_builder": None,
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
        if len(r) and r.min() < 0:
            # the active-set screen needs G ≥ 0; fall back to whole-Gram FISTA
            self._fit_whole_gram(mat)
        else:
            self._fit_active_set(mat)

    # ------------------------------------------------------- active-set path
    def _fit_active_set(self, mat: csr_matrix) -> None:
        n_q, n_i = mat.shape
        l1, l2 = np.float32(self.lambda_), np.float32(self.beta)
        gram = (mat.T @ mat).tocsc()
        gram.sort_indices()

        # exact screen: candidate k for column j iff G_kj > n·λ₁, k ≠ j
        entry_col = np.repeat(np.arange(n_i), np.diff(gram.indptr))
        keep = (gram.data > n_q * float(l1)) & (gram.indices != entry_col)
        act_idx = gram.indices[keep].astype(np.int64)
        act_col = entry_col[keep]
        counts = np.bincount(act_col, minlength=n_i)
        col_ptr = np.concatenate([[0], np.cumsum(counts)])

        # a loose screen (tiny λ₁, few users, popularity-heavy data) keeps
        # nearly every entry: the tiered solves then cost Σ padded_size² per
        # FISTA step vs the whole-Gram path's flat n_i².  Dispatch on the
        # modeled cost — the two paths produce the same solution
        # (tests/models/test_factorization.py::test_slim_active_set_matches
        # _whole_gram), whole-Gram just batches all columns at once.
        padded = np.maximum(32, 2 ** np.ceil(np.log2(np.maximum(counts, 1))))
        if np.sum(padded.astype(np.float64) ** 2) > float(n_i) ** 2:
            self._fit_whole_gram(mat)
            return

        sim = np.zeros((n_i, n_i), dtype=np.float32)
        nonzero_cols = np.nonzero(counts)[0]
        if len(nonzero_cols) == 0:
            self._set_similarity_dense(sim)
            return

        dense_gram = gram.toarray() if n_i <= _DENSE_GRAM_MAX else None
        csr_gram = None if dense_gram is not None else gram.tocsr()

        # group columns into padded size tiers (powers of two)
        sizes = counts[nonzero_cols]
        tiers = np.maximum(32, 2 ** np.ceil(np.log2(sizes)).astype(np.int64))
        tiers = np.minimum(tiers, n_i)
        for tier in np.unique(tiers):
            cols = nonzero_cols[tiers == tier]
            s = int(tier)
            # chunk so C·S² stays within a ~64 MB f32 working set
            chunk = min(max(1, (16 << 20) // (s * s)), len(cols))
            for start in range(0, len(cols), chunk):
                jcols = cols[start : start + chunk]
                self._solve_tier(
                    jcols, s, act_idx, col_ptr, counts,
                    dense_gram, csr_gram, n_q, l1, l2, sim, pad_to=chunk,
                )
        self._set_similarity_dense(sim)

    def _solve_tier(
        self, jcols, s, act_idx, col_ptr, counts,
        dense_gram, csr_gram, n_q, l1, l2, sim, pad_to=None,
    ) -> None:
        # pad the chunk to a fixed column count so every chunk of a tier
        # shares one compiled kernel shape (padded columns: all-invalid)
        c = pad_to if pad_to is not None else len(jcols)
        real = len(jcols)
        idx = np.zeros((c, s), dtype=np.int64)
        valid = np.zeros((c, s), dtype=np.float32)
        for row, j in enumerate(jcols):  # cheap: builds index lists only
            lo, hi = col_ptr[j], col_ptr[j + 1]
            idx[row, : counts[j]] = act_idx[lo:hi]
            valid[row, : counts[j]] = 1.0
        jcols = np.concatenate([jcols, np.zeros(c - real, dtype=jcols.dtype)])

        if dense_gram is not None:
            gsub = dense_gram[idx[:, :, None], idx[:, None, :]].astype(np.float32)
            rhs = dense_gram[idx, jcols[:, None]].astype(np.float32)
        else:
            rows = np.broadcast_to(idx[:, :, None], (c, s, s)).ravel()
            colsg = np.broadcast_to(idx[:, None, :], (c, s, s)).ravel()
            gsub = np.asarray(csr_gram[rows, colsg]).reshape(c, s, s).astype(np.float32)
            rhs = (
                np.asarray(csr_gram[idx.ravel(), np.repeat(jcols, s)])
                .reshape(c, s)
                .astype(np.float32)
            )

        gsub_j = jnp.asarray(gsub) / n_q
        rhs_j = jnp.asarray(rhs) / n_q
        valid_j = jnp.asarray(valid)
        lip = _bucket_lipschitz(gsub_j, valid_j) + l2
        step = 1.0 / jnp.maximum(lip, 1e-12)

        w = jnp.zeros((c, s), dtype=jnp.float32)
        z, t = w, jnp.ones((c,), dtype=jnp.float32)
        inner = 25
        done = 0
        while done < self.max_iter:
            w_prev = w
            w, z, t = _bucket_fista(
                w, z, t, gsub_j, rhs_j, valid_j, l1, l2, step, inner
            )
            done += inner
            delta = float(jnp.max(jnp.abs(w - w_prev)))
            scale = float(jnp.max(jnp.abs(w)))
            if delta <= self.tol * max(scale, 1.0):
                break

        w_np = np.asarray(w)
        sel = (w_np > 0) & (valid > 0)
        rows_out = idx[sel]
        cols_out = np.broadcast_to(jcols[:, None], idx.shape)[sel]
        sim[rows_out, cols_out] = w_np[sel]

    # ------------------------------------------------------ whole-Gram path
    def _fit_whole_gram(self, mat: csr_matrix) -> None:
        n_q, n_i = mat.shape
        gram = np.zeros((n_i, n_i), dtype=np.float32)
        dot = jax.jit(lambda a: jnp.dot(a.T, a, preferred_element_type=jnp.float32))
        for start in range(0, n_q, 4096):
            dense = mat[start : start + 4096].toarray()
            gram += np.asarray(dot(jnp.asarray(dense)))

        # sklearn ElasticNet parametrization (reference slim.py:97-99)
        alpha = self.beta + self.lambda_
        l1 = jnp.float32(alpha * (self.lambda_ / alpha))  # = lambda_
        l2 = jnp.float32(alpha * (1.0 - self.lambda_ / alpha))  # = beta
        gram_n = jnp.asarray(gram / n_q)

        # Lipschitz constant via power iteration on G/n + l2 I
        v = jnp.ones((n_i,), dtype=jnp.float32) / np.sqrt(n_i)
        for _ in range(20):
            v = jnp.dot(gram_n, v, preferred_element_type=jnp.float32)
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        lip = float(jnp.dot(v, jnp.dot(gram_n, v))) + float(l2)
        step = jnp.float32(1.0 / max(lip, 1e-12))

        diag_mask = jnp.asarray(1.0 - np.eye(n_i, dtype=np.float32))
        w = jnp.zeros((n_i, n_i), dtype=jnp.float32)
        z = w
        t = jnp.float32(1.0)
        last = None
        for it in range(self.max_iter):
            w, z, t = _fista_step(w, z, t, gram_n, l1, l2, step, diag_mask)
            if it % 25 == 24:
                cur = float(jnp.abs(w).sum())
                if last is not None and abs(cur - last) <= self.tol * max(last, 1.0):
                    break
                last = cur
        self._set_similarity_dense(np.asarray(w))

    def _get_ann_infer_params(self) -> dict:
        return {"features_col": None}
