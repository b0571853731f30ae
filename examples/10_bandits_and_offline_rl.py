"""Bandits + offline RL (analog of reference examples/12-13 and
train_ddpg/train_dt4rec/cql_compare): non-personalized bandits on binary
feedback, contextual LinUCB on user features, then the offline-RL trio
(DDPG / DT4Rec / DiscreteCQL) compared against RandomRec.

    python examples/10_bandits_and_offline_rl.py
"""

import os
import sys
import time
from pathlib import Path

_device = os.environ.get("REPLAY_TPU_DEVICE", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _device)
import jax  # noqa: E402

jax.config.update("jax_platforms", _device)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.experimental.models import DDPG, DT4Rec, DiscreteCQL
from replay_tpu.models import KLUCB, UCB, LinUCB, RandomRec, ThompsonSampling, Wilson

N_GROUPS, GROUP_SIZE = 4, 15
N_ITEMS = N_GROUPS * GROUP_SIZE


def make_schema(extra=()):
    return FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING),
            *extra,
        ]
    )


def binary_log(n_users=200, seed=2):
    """Bernoulli rewards: item quality rises with item id."""
    rng = np.random.default_rng(seed)
    quality = np.linspace(0.1, 0.9, N_ITEMS)
    rows = []
    for u in range(n_users):
        for i in rng.choice(N_ITEMS, size=20, replace=False):
            rows.append((u, int(i), float(rng.random() < quality[i])))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])


def block_log(n_users=80, seed=0, timestamps=True):
    """Users stick to one item group (structure for the RL models)."""
    rng = np.random.default_rng(seed)
    rows, t = [], 0
    for u in range(n_users):
        g = u % N_GROUPS
        for _ in range(20):
            item = (
                int(g * GROUP_SIZE + rng.integers(0, GROUP_SIZE))
                if rng.random() < 0.9
                else int(rng.integers(0, N_ITEMS))
            )
            row = (u, item, float(rng.integers(1, 6)))
            rows.append(row + (t,) if timestamps else row)
            t += 1
    cols = ["user_id", "item_id", "rating"] + (["timestamp"] if timestamps else [])
    return pd.DataFrame(rows, columns=cols).drop_duplicates(["user_id", "item_id"])


def in_group_fraction(recs):
    hits = tot = 0
    for u, grp in recs.groupby("user_id"):
        lo = (u % N_GROUPS) * GROUP_SIZE
        hits += ((grp["item_id"] >= lo) & (grp["item_id"] < lo + GROUP_SIZE)).sum()
        tot += len(grp)
    return hits / tot


def main():
    # ---- 1. non-personalized bandits on binary feedback
    ds = Dataset(make_schema(), binary_log())
    true_best = set(range(N_ITEMS - 10, N_ITEMS))  # ten highest-quality items
    print(f"{'bandit':20s} {'top-10 overlap with best arms':>30s}")
    for model in (UCB(), KLUCB(), ThompsonSampling(seed=0), Wilson()):
        model.fit(ds)
        recs = model.predict(ds, k=10, queries=[0], filter_seen_items=False)
        overlap = len(set(recs["item_id"]) & true_best)
        print(f"{type(model).__name__:20s} {overlap:>25d} / 10")

    # ---- 2. contextual bandit: reward linear in user features per arm
    rng = np.random.default_rng(1)
    users = np.arange(80)
    feats = rng.normal(size=(80, 3))
    theta = rng.normal(size=(8, 3))
    rows = [
        (int(u), a, float(feats[u] @ theta[a] > 0))
        for u in users
        for a in range(8)
    ]
    inter = pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])
    qf = pd.DataFrame({"user_id": users, **{f"f{j}": feats[:, j] for j in range(3)}})
    itf = pd.DataFrame({"item_id": np.arange(8), "bias": np.ones(8)})
    extra = [
        FeatureInfo(f"f{j}", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES)
        for j in range(3)
    ] + [FeatureInfo("bias", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES)]
    ctx_ds = Dataset(make_schema(extra), inter, query_features=qf, item_features=itf)
    lin = LinUCB(eps=-10.0, alpha=1.0)  # exploit-only for evaluation
    lin.fit(ctx_ds)
    recs = lin.predict(ctx_ds, k=1, filter_seen_items=False)
    best_arm = (feats @ theta.T).argmax(axis=1)
    acc = (recs.sort_values("user_id")["item_id"].to_numpy() == best_arm).mean()
    print(f"\nLinUCB picks the best arm for {acc:.0%} of users (chance 12.5%)")

    # ---- 3. offline RL trio vs random on block-structured logs
    rl_ds = Dataset(
        make_schema(
            [FeatureInfo("timestamp", FeatureType.NUMERICAL,
                         feature_hint=FeatureHint.TIMESTAMP)]
        ),
        block_log(),
    )
    models = [
        RandomRec(seed=0),
        DDPG(embedding_dim=16, epochs=120, batch_size=128, embedding_lr=3e-2, seed=0),
        DiscreteCQL(embedding_dim=16, epochs=120, batch_size=128, seed=0),
        DT4Rec(trajectory_len=8, memory_size=5, embedding_dim=32,
               num_blocks=1, num_heads=2, epochs=30, batch_size=32, seed=0),
    ]
    print(f"\n{'offline-RL model':20s} {'in-group@5':>10s} {'fit+predict s':>14s}")
    for model in models:
        t0 = time.time()
        model.fit(rl_ds)
        frac = in_group_fraction(model.predict(rl_ds, k=5))
        print(f"{type(model).__name__:20s} {frac:10.2f} {time.time() - t0:14.1f}")
    print("(chance level ~0.25; the RL models recover the block structure)")


if __name__ == "__main__":
    main()
