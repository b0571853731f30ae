"""ADMM SLIM (Steck et al., WSDM 2020).

TPU-native analog of the reference (reference:
replay/experimental/models/admm_slim.py:68).  Unlike FISTA SLIM
(replay_tpu/models/slim.py), ADMM pre-factorizes the regularized Gram
matrix ONCE — each iteration is then two dense [n, n] matmuls plus
elementwise soft-thresholding, all on the MXU:

    P   = (XᵀX + (λ₂ + ρ₀)I)⁻¹             (computed once, at the initial ρ)
    B   = P XᵀX + P (ρZ − Γ)   with diagonal correction so diag(B)=0
    Z   = soft_threshold(B + Γ/ρ, λ₁/ρ)     (signed — negatives allowed,
                                             like the reference's numba loop)
    Γ  += ρ (B − Z)

ρ adapts by ``multiplicator`` whenever the primal/dual residuals diverge by
more than ``threshold`` (reference _main_iteration, admm_slim.py:17-65), and
the solve stops when both residuals drop under their eps_abs/eps_rel
tolerances or ``max_iteration`` is reached — the whole loop runs on device
as one ``lax.while_loop``.
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


def _admm_solve(
    p, p_x, b, z, gamma, rho, l1, eps_abs, eps_rel, threshold, multiplicator, max_iteration
):
    """Full ADMM solve as one on-device while_loop.

    State mirrors the reference's ``_main_iteration`` (unscaled dual Γ, ρ
    carried through the loop so the adaptive update composes with the
    stopping rule).  ``p`` stays at the initial ρ like the reference, which
    never refactorizes.
    """
    n = p.shape[0]
    p_diag = jnp.maximum(jnp.diag(p), 1e-12)

    def cond(state):
        _, _, _, _, r_primal, r_dual, eps_primal, eps_dual, it = state
        return ((r_primal > eps_primal) | (r_dual > eps_dual)) & (it < max_iteration)

    def body(state):
        b, z, gamma, rho, _, _, _, _, it = state
        b = p_x + jnp.dot(p, rho * z - gamma, preferred_element_type=jnp.float32)
        vec_gamma = jnp.diag(b) / p_diag
        b = b - p * vec_gamma[None, :]

        prev_z = z
        c = b + gamma / rho
        coef = l1 / rho
        z = jnp.maximum(c - coef, 0.0) - jnp.maximum(-c - coef, 0.0)

        gamma = gamma + rho * (b - z)

        r_primal = jnp.linalg.norm(b - z)
        r_dual = jnp.linalg.norm(-rho * (z - prev_z))
        eps_primal = eps_abs * n + eps_rel * jnp.maximum(
            jnp.linalg.norm(b), jnp.linalg.norm(z)
        )
        eps_dual = eps_abs * n + eps_rel * jnp.linalg.norm(gamma)
        rho = jnp.where(
            r_primal > threshold * r_dual,
            rho * multiplicator,
            jnp.where(threshold * r_primal < r_dual, rho / multiplicator, rho),
        )
        return (b, z, gamma, rho, r_primal, r_dual, eps_primal, eps_dual, it + 1)

    r_primal0 = jnp.linalg.norm(b - z)
    r_dual0 = jnp.linalg.norm(rho * z)
    init = (
        b,
        z,
        gamma,
        rho,
        r_primal0,
        r_dual0,
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.int32(0),
    )
    b, z, gamma, rho, *_ = jax.lax.while_loop(cond, body, init)
    return z


_admm_solve_jit = jax.jit(_admm_solve, static_argnames=("max_iteration",))


class ADMMSLIM(NeighbourRec):
    """SLIM with ADMM optimization and exact zero diagonal.

    Matches the reference surface: ``lambda_1``/``lambda_2``/``seed`` ctor
    params, ``rho`` initialized to ``lambda_2``, and the
    threshold/multiplicator/eps/max_iteration solver attributes
    (reference: replay/experimental/models/admm_slim.py:81-117).
    """

    _search_space = _search_space

    threshold: float = 5.0
    multiplicator: float = 2.0
    eps_abs: float = 1.0e-3
    eps_rel: float = 1.0e-3

    def __init__(
        self,
        lambda_1: float = 5.0,
        lambda_2: float = 5000.0,
        seed: Optional[int] = None,
        rho: Optional[float] = None,
        max_iteration: int = 100,
        n_iterations: Optional[int] = None,
        index_builder=None,
    ):
        if lambda_1 < 0 or lambda_2 <= 0:
            msg = "Invalid regularization parameters"
            raise ValueError(msg)
        self.lambda_1 = lambda_1
        self.lambda_2 = lambda_2
        self.seed = seed
        self.rho = rho if rho is not None else lambda_2
        # back-compat alias from earlier replay_tpu releases
        self.max_iteration = int(n_iterations if n_iterations is not None else max_iteration)
        self.index_builder = index_builder

    @property
    def _init_args(self):
        return {
            "lambda_1": self.lambda_1,
            "lambda_2": self.lambda_2,
            "seed": self.seed,
            "rho": self.rho,
            "max_iteration": self.max_iteration,
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

        gram_dev = jnp.asarray(gram)
        p = jnp.linalg.inv(gram_dev + (self.lambda_2 + self.rho) * jnp.eye(n_i))
        p_x = jnp.dot(p, gram_dev, preferred_element_type=jnp.float32)

        # random init, seeded like the reference's _init_matrix (np.random.rand)
        host_rng = np.random.RandomState(self.seed)
        b = jnp.asarray(host_rng.rand(n_i, n_i).astype(np.float32))
        z = jnp.asarray(host_rng.rand(n_i, n_i).astype(np.float32))
        gamma = jnp.asarray(host_rng.rand(n_i, n_i).astype(np.float32))

        z = _admm_solve_jit(
            p,
            p_x,
            b,
            z,
            gamma,
            jnp.float32(self.rho),
            jnp.float32(self.lambda_1),
            jnp.float32(self.eps_abs),
            jnp.float32(self.eps_rel),
            jnp.float32(self.threshold),
            jnp.float32(self.multiplicator),
            self.max_iteration,
        )
        sim = np.array(z)  # writable copy (device arrays are read-only views)
        np.fill_diagonal(sim, 0.0)
        self._set_similarity_dense(sim)

    def _get_ann_infer_params(self) -> dict:
        return {"features_col": None}
