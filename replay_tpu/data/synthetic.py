"""Synthetic MovieLens-1M: a generator matched to the published statistics.

The real `ratings.dat` is not obtainable in a zero-egress build image
(QUALITY.md), but the reference checkout ships the ML-1M *metadata*
(`examples/data/ml1m_users.dat` — 6040 users with gender/age/occupation —
and `ml1m_items.dat` — 3883 movies with genre tags).  This module generates
an interaction log that matches ML-1M's published marginals so the full
notebook-02 comparison protocol (reference:
examples/02_models_comparison.ipynb) can run at the real scale and
statistics:

- 6040 users; ~3700 of the 3883 movies receive ≥1 rating;
- ≈1,000,209 ratings;
- per-user counts: min 20 (the ML-1M inclusion rule), mean ≈165,
  median ≈96, heavy lognormal tail capped at 2314 (the real maximum);
- per-item popularity: lognormal/power-law, max ≈3428 (the real maximum);
- rating values match the published distribution
  (1: 5.6%, 2: 10.8%, 3: 26.1%, 4: 34.9%, 5: 22.6%), correlated with the
  latent preference that produced the interaction;
- timestamps span April 2000 → Feb 2003 with an early-heavy arrival curve
  and bursty per-user sessions (the real log's shape).

Preferences are LEARNABLE, not uniform noise: users embed through their
demographic attributes, items through their genre tags, plus latent noise —
so genre/demographic structure exists for models to recover, as in the
real data.  Item selection is Gumbel-top-k over (affinity + log-popularity),
i.e. sampling without replacement from a softmax preference distribution.

This is a statistics-matched SURROGATE: absolute metric values below the
real table are expected (the latent space is simpler than human taste),
but model ORDERING and the protocol itself are exercised end to end at the
true scale.  `examples/04_models_comparison.py --synthetic-ml1m` runs it.
"""

from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import pandas as pd

REFERENCE_DATA = Path("/root/reference/examples/data")

# published ML-1M marginals
N_USERS = 6040
N_MOVIES = 3883
N_RATINGS = 1_000_209
RATING_SHARES = {1: 0.05617, 2: 0.10755, 3: 0.26114, 4: 0.34890, 5: 0.22624}
MAX_PER_USER = 2314
MAX_PER_ITEM = 3428
SPAN_START = 956_703_932  # 2000-04-26, the first ML-1M timestamp
SPAN_END = 1_046_454_590  # 2003-02-28, the last

GENRES = [
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]


def _load_users(path: Optional[str]) -> pd.DataFrame:
    """ml1m_users.dat: ``user_id \\t gender \\t age \\t occupation \\t zip``."""
    if path is None:
        cand = REFERENCE_DATA / "ml1m_users.dat"
        path = str(cand) if cand.exists() else None
    if path is None:
        # parametric fallback: marginals of the published demographics
        rng = np.random.default_rng(17)
        return pd.DataFrame(
            {
                "user_id": np.arange(1, N_USERS + 1),
                "gender": rng.choice(["M", "F"], N_USERS, p=[0.717, 0.283]),
                "age": rng.choice(
                    [1, 18, 25, 35, 45, 50, 56], N_USERS,
                    p=[0.037, 0.183, 0.347, 0.197, 0.091, 0.081, 0.064],
                ),
                "occupation": rng.integers(0, 21, N_USERS),
            }
        )
    frame = pd.read_csv(
        path, sep="\t", names=["user_id", "gender", "age", "occupation", "zip"],
        dtype={"user_id": np.int64, "age": np.int64, "occupation": np.int64},
    )
    return frame[["user_id", "gender", "age", "occupation"]]


def _load_items(path: Optional[str]) -> pd.DataFrame:
    """ml1m_items.dat: ``item_id \\t title (year) \\t genre|genre``."""
    if path is None:
        cand = REFERENCE_DATA / "ml1m_items.dat"
        path = str(cand) if cand.exists() else None
    if path is None:
        rng = np.random.default_rng(19)
        n_genres = 1 + (rng.random(N_MOVIES) < 0.45) + (rng.random(N_MOVIES) < 0.15)
        genres = [
            "|".join(rng.choice(GENRES, size=k, replace=False)) for k in n_genres
        ]
        return pd.DataFrame(
            {
                "item_id": np.arange(1, N_MOVIES + 1),
                "title": [f"Movie {i} (1995)" for i in range(1, N_MOVIES + 1)],
                "genres": genres,
            }
        )
    return pd.read_csv(path, sep="\t", names=["item_id", "title", "genres"])


def _per_user_counts(rng, n_users: int, total: int) -> np.ndarray:
    """min-20 shifted lognormal matched to mean≈165 / median≈96, scaled to
    the published total."""
    raw = 20.0 + rng.lognormal(mean=4.33, sigma=1.14, size=n_users)
    raw = np.minimum(raw, MAX_PER_USER)
    counts = np.maximum(20, np.round(raw * (total / raw.sum()))).astype(np.int64)
    counts = np.minimum(counts, MAX_PER_USER)
    return counts


def synthetic_ml1m(
    users_dat: Optional[str] = None,
    items_dat: Optional[str] = None,
    seed: int = 0,
    scale: float = 1.0,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(interactions, user_features, item_features) at ML-1M statistics.

    :param users_dat/items_dat: paths to the ML-1M metadata files; default
        to the reference checkout's copies, falling back to parametric
        marginals when absent.
    :param scale: shrink factor for quick runs (0.1 → ~100k interactions,
        users subsampled accordingly; 1.0 = full published scale).
    :returns: interactions ``[query_id, item_id, rating, timestamp]`` plus
        the user/item feature frames.
    """
    rng = np.random.default_rng(seed)
    users = _load_users(users_dat)
    items = _load_items(items_dat)
    if scale < 1.0:
        users = users.iloc[: max(8, int(len(users) * scale))].reset_index(drop=True)
    n_users, n_movies = len(users), len(items)
    total = int(N_RATINGS * (n_users / N_USERS))

    # ---- latent structure: demographics × genres + noise ------------------
    p_dim = 16
    genre_hot = np.zeros((n_movies, len(GENRES)), np.float32)
    for row, g in enumerate(items["genres"].fillna("")):
        for name in str(g).split("|"):
            if name in GENRES:
                genre_hot[row, GENRES.index(name)] = 1.0
    genre_hot /= np.maximum(genre_hot.sum(1, keepdims=True), 1.0)

    age_groups = sorted(users["age"].unique().tolist())
    demo = np.zeros((n_users, 2 + len(age_groups) + 21), np.float32)
    demo[np.arange(n_users), (users["gender"] == "F").to_numpy().astype(int)] = 1.0
    age_idx = users["age"].map({a: j for j, a in enumerate(age_groups)}).to_numpy()
    demo[np.arange(n_users), 2 + age_idx] = 1.0
    occ = users["occupation"].to_numpy() % 21
    demo[np.arange(n_users), 2 + len(age_groups) + occ] = 1.0

    proj_g = rng.normal(0, 1, (len(GENRES), p_dim)).astype(np.float32)
    proj_d = rng.normal(0, 1, (demo.shape[1], p_dim)).astype(np.float32)
    item_vec = genre_hot @ proj_g + 0.6 * rng.normal(0, 1, (n_movies, p_dim)).astype(np.float32)
    user_vec = demo @ proj_d / np.sqrt(3.0) + 0.6 * rng.normal(
        0, 1, (n_users, p_dim)
    ).astype(np.float32)
    item_vec /= np.maximum(np.linalg.norm(item_vec, axis=1, keepdims=True), 1e-6)
    user_vec /= np.maximum(np.linalg.norm(user_vec, axis=1, keepdims=True), 1e-6)

    # log-popularity: lognormal body, capped at the published per-item max
    log_pop = rng.normal(0.0, 1.45, n_movies).astype(np.float32)

    counts = _per_user_counts(rng, n_users, total)
    counts = np.minimum(counts, n_movies)

    # ---- Gumbel-top-k selection per user (vectorized in chunks) -----------
    affinity_scale = 3.0  # structure-to-noise knob: higher = more learnable
    user_rows = []
    item_rows = []
    score_rows = []
    chunk = 256
    for lo in range(0, n_users, chunk):
        hi = min(lo + chunk, n_users)
        scores = affinity_scale * (user_vec[lo:hi] @ item_vec.T) + log_pop[None, :]
        gumbel = rng.gumbel(0.0, 1.0, scores.shape).astype(np.float32)
        noisy = scores + gumbel
        for u in range(lo, hi):
            k = counts[u]
            sel = np.argpartition(-noisy[u - lo], k - 1)[:k]
            user_rows.append(np.full(k, u, np.int32))
            item_rows.append(sel.astype(np.int32))
            score_rows.append(scores[u - lo, sel])
    u_idx = np.concatenate(user_rows)
    i_idx = np.concatenate(item_rows)
    pref = np.concatenate(score_rows)

    # ---- enforce the per-item cap (published max 3428) --------------------
    item_counts = np.bincount(i_idx, minlength=n_movies)
    over = np.flatnonzero(item_counts > MAX_PER_ITEM)
    if len(over):
        keep = np.ones(len(i_idx), bool)
        for it in over:
            pos = np.flatnonzero(i_idx == it)
            drop = rng.choice(pos, size=len(pos) - MAX_PER_ITEM, replace=False)
            keep[drop] = False
        u_idx, i_idx, pref = u_idx[keep], i_idx[keep], pref[keep]

    # ---- ratings: exact published marginals, ordered by preference --------
    blend = pref + rng.normal(0.0, 1.5, len(pref)).astype(np.float32)
    order = np.argsort(blend)  # ascending: worst first
    ratings = np.empty(len(pref), np.int8)
    start = 0
    for value in (1, 2, 3, 4, 5):
        n_val = int(round(RATING_SHARES[value] * len(pref)))
        end = len(pref) if value == 5 else min(start + n_val, len(pref))
        ratings[order[start:end]] = value
        start = end

    # ---- timestamps: early-heavy arrivals, bursty sessions ----------------
    # early-heavy arrivals with a genuine late tail (the real log keeps
    # accumulating users into 2002-2003, which is what a 0.2 time split's
    # test window catches)
    span = SPAN_END - SPAN_START - 200 * 86400
    early = rng.beta(1.1, 3.0, n_users)
    late = rng.uniform(0.0, 1.0, n_users)
    arrival = SPAN_START + span * np.where(rng.random(n_users) < 0.75, early, late)
    ts = np.empty(len(pref), np.int64)
    pos = 0
    final_counts = np.bincount(u_idx, minlength=n_users)
    order_u = np.argsort(u_idx, kind="stable")
    for u in range(n_users):
        k = final_counts[u]
        if k == 0:
            continue
        # bursty activity inside a per-user window: most users finish in
        # days, heavy users stretch out (real ML-1M shape), always inside
        # the published span
        duration = min(rng.exponential(20 * 86400) + 3600, 500 * 86400)
        offsets = np.sort(rng.random(k)) * duration
        ts[order_u[pos : pos + k]] = (arrival[u] + offsets).astype(np.int64)
        pos += k

    interactions = pd.DataFrame(
        {
            "query_id": users["user_id"].to_numpy()[u_idx],
            "item_id": items["item_id"].to_numpy()[i_idx],
            "rating": ratings.astype(np.float32),
            "timestamp": ts,
        }
    )
    interactions = interactions.sort_values(
        ["query_id", "timestamp"], kind="stable"
    ).reset_index(drop=True)
    user_features = users.copy()
    item_features = items.copy()
    return interactions, user_features, item_features
