"""SLIM: Sparse Linear Methods (Ning & Karypis, ICDM 2011).

TPU-native replacement for the reference SLIM (reference:
replay/models/slim.py:20), which fits one sklearn ElasticNet per item column
inside a Spark pandas_udf.  Here ALL item columns are solved simultaneously
by batched proximal-gradient (FISTA) on device:

    W* = argmin_{W≥0, diag(W)=0}  1/(2n)‖R − RW‖² + λ₁‖W‖₁ + λ₂/2‖W‖²

using the Gram matrix G = RᵀR (one blocked MXU matmul) so each FISTA step
is a single [n_i, n_i] × [n_i, n_i] GEMM — the per-column coordinate
descent of the reference becomes a whole-matrix kernel.  Regularization
mapping matches sklearn's parametrization exactly: ``alpha = beta +
lambda_``, ``l1_ratio = lambda_ / alpha``, objective scaled by 1/n_samples,
``positive=True`` (reference: replay/models/slim.py:115-124).
"""

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

        # Gram via blocked MXU matmuls (float32 accumulate)
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
