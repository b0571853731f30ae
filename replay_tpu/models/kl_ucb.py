"""KL-UCB bandit recommender (reference: replay/models/kl_ucb.py:14).

The reference solves the per-item KL-UCB bound with scipy's brentq root
finder inside a Spark UDF; here the bound is found with a fixed-iteration
vectorized bisection over all items at once (compiler-friendly, no
data-dependent control flow), accurate to ~1e-9.
"""

import math
from typing import Optional

import numpy as np

from replay_tpu.models.ucb import UCB

_EPS = 1e-12
_BISECT_ITERS = 60


def _bernoulli_kl(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    p = np.clip(p, _EPS, 1 - _EPS)
    q = np.clip(q, _EPS, 1 - _EPS)
    return p * np.log(p / q) + (1 - p) * np.log((1 - p) / (1 - q))


def kl_ucb_bound(pos: np.ndarray, total: np.ndarray, rhs: np.ndarray) -> np.ndarray:
    """Vectorized solve of max{q >= p : total * KL(p, q) <= rhs} by bisection,
    with the reference's exact special cases (reference kl_ucb.py:148-166):

    - ``p == 0``: the root of ``log(1/(1-q)) = rhs`` → ``1 - exp(-rhs)``
      (NOT scaled by ``total`` — upstream quirk mirrored for parity);
    - ``p == 1``: the root of ``log(1/q) = rhs`` → ``exp(-rhs)``
      (a tiny value: all-positive items rank LOW upstream — mirrored).
    """
    p = pos / total
    lo = p.copy()
    hi = np.full_like(p, 1.0 - _EPS)
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        too_big = total * _bernoulli_kl(p, mid) > rhs
        hi = np.where(too_big, mid, hi)
        lo = np.where(too_big, lo, mid)
    bound = 0.5 * (lo + hi)
    bound = np.where(p == 0.0, 1.0 - np.exp(-rhs), bound)
    bound = np.where(p == 1.0, np.exp(-rhs), bound)
    return bound


class KLUCB(UCB):
    """Bernoulli KL-divergence UCB; tighter than the Hoeffding-style UCB bound."""

    def __init__(
        self,
        exploration_coef: float = 0.0,
        sample: bool = False,
        seed: Optional[int] = None,
    ):
        super().__init__(exploration_coef=exploration_coef, sample=sample, seed=seed)

    def _calc_item_popularity(self) -> None:
        pos = self.items_counts_aggr["pos"].to_numpy(dtype=np.float64)
        total = self.items_counts_aggr["total"].to_numpy(dtype=np.float64)
        log_n = math.log(self.full_count)
        rhs = log_n + self.coef * math.log(max(log_n, _EPS))
        ucb = kl_ucb_bound(pos, total, np.full_like(pos, rhs))
        self.item_popularity = self.items_counts_aggr[[self.item_column]].assign(
            **{self.rating_column: ucb}
        )
        # cold items rank above everything (reference kl_ucb.py:173:
        # fill = 1 + sqrt(coef * log(n)), which exceeds any solved bound)
        self.fill = 1.0 + math.sqrt(max(self.coef * math.log(self.full_count), 0.0))
