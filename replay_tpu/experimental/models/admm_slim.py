"""ADMM SLIM (Steck et al., WSDM 2020).

TPU-native analog of the reference (reference:
replay/experimental/models/admm_slim.py:68).  Unlike FISTA SLIM
(replay_tpu/models/slim.py), ADMM pre-factorizes the regularized Gram
matrix ONCE — each iteration is then two dense [n, n] matmuls plus
elementwise soft-thresholding, all on the MXU:

    P   = (XᵀX + (λ₂ + ρ)I)⁻¹
    B   = P (XᵀX + ρ(Z − Γ))   with diagonal correction so diag(B)=0
    Z   = soft_threshold(B + Γ, λ₁/ρ)₊
    Γ  += B − Z
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_neighbour_rec import NeighbourRec

_search_space = {
    "lambda_1": {"type": "loguniform", "args": [1e-9, 50]},
    "lambda_2": {"type": "loguniform", "args": [1e-9, 5000]},
}


@jax.jit
def _admm_iteration(b, z, gamma, p, gram, rho, l1):
    c = gram + rho * (z - gamma)
    b_hat = jnp.dot(p, c, preferred_element_type=jnp.float32)
    # enforce diag(B)=0 via the lagrangian diagonal correction
    gamma_diag = jnp.diag(b_hat) / jnp.maximum(jnp.diag(p), 1e-12)
    b = b_hat - p * gamma_diag[None, :]
    # soft threshold + nonnegativity
    z_new = jnp.maximum(jnp.abs(b + gamma) - l1 / rho, 0.0) * jnp.sign(b + gamma)
    z_new = jnp.maximum(z_new, 0.0)
    gamma = gamma + b - z_new
    return b, z_new, gamma


class ADMMSLIM(NeighbourRec):
    """SLIM with ADMM optimization and exact zero diagonal."""

    _search_space = _search_space

    def __init__(
        self,
        lambda_1: float = 5.0,
        lambda_2: float = 5000.0,
        seed: Optional[int] = None,
        rho: Optional[float] = None,
        n_iterations: int = 50,
        index_builder=None,
    ):
        if lambda_1 < 0 or lambda_2 <= 0:
            msg = "Invalid regularization parameters"
            raise ValueError(msg)
        self.lambda_1 = lambda_1
        self.lambda_2 = lambda_2
        self.seed = seed
        self.rho = rho if rho is not None else lambda_2
        self.n_iterations = n_iterations
        self.index_builder = index_builder

    @property
    def _init_args(self):
        return {
            "lambda_1": self.lambda_1,
            "lambda_2": self.lambda_2,
            "seed": self.seed,
            "rho": self.rho,
            "n_iterations": self.n_iterations,
            "index_builder": None,
        }

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        q = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy())
        i = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy())
        r = (
            inter[self.rating_column].to_numpy(dtype=np.float32)
            if self.rating_column in inter.columns
            else np.ones(len(inter), dtype=np.float32)
        )
        n_q, n_i = len(self.fit_queries), len(self.fit_items)
        mat = csr_matrix((r, (q, i)), shape=(n_q, n_i))

        gram = np.zeros((n_i, n_i), dtype=np.float32)
        dot = jax.jit(lambda a: jnp.dot(a.T, a, preferred_element_type=jnp.float32))
        for start in range(0, n_q, 4096):
            gram += np.asarray(dot(jnp.asarray(mat[start : start + 4096].toarray())))

        rho = jnp.float32(self.rho)
        l1 = jnp.float32(self.lambda_1)
        gram_dev = jnp.asarray(gram)
        p = jnp.linalg.inv(gram_dev + (self.lambda_2 + self.rho) * jnp.eye(n_i))

        b = jnp.zeros((n_i, n_i), dtype=jnp.float32)
        z = b
        gamma = b
        for _ in range(self.n_iterations):
            b, z, gamma = _admm_iteration(b, z, gamma, p, gram_dev, rho, l1)
        sim = np.array(z)  # writable copy (device arrays are read-only views)
        np.fill_diagonal(sim, 0.0)
        self._set_similarity_dense(sim)

    def _get_ann_infer_params(self) -> dict:
        return {"features_col": None}
