"""DDPG actor-critic recommender.

TPU-native analog of the reference (reference:
replay/experimental/models/ddpg.py:475 — ActorDRR/CriticDRR, replay
buffer, Ornstein-Uhlenbeck noise; ~932 LoC of torch).  Offline variant:

- **state**: masked mean of the user's recent item embeddings (the
  reference's DRR-ave state representation, ddpg.py:430);
- **item embeddings are LEARNED**: like the reference's StateReprModule
  embeddings inside ActorDRR (ddpg.py:443-456), the table is a trainable
  parameter receiving gradients from both the critic TD loss (through
  state and action vectors) and the actor loss (through state), with a
  polyak-averaged target copy for TD bootstrapping;
- **actor**: MLP state → action vector in item-embedding space;
- **critic**: MLP Q(state, action);
- offline transitions from the log (state built from the history prefix,
  action = the interacted item's embedding, reward = rating);
- **conservative critic**: the log is positive-only, so the TD loss alone
  gives no ranking signal (every logged action earns the same return); a
  CQL-style penalty regresses Q of uniformly sampled out-of-distribution
  actions toward zero, making logged actions score above random ones —
  the offline-RL analog of the reference's online exploration noise;
- **recommend**: items ranked by ``actor(state) · item_embedding`` — the
  reference's nearest-action-item scoring.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender


class _Actor(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, state):
        h = nn.relu(nn.Dense(128, name="fc1")(state))
        h = nn.relu(nn.Dense(64, name="fc2")(h))
        return jnp.tanh(nn.Dense(self.dim, name="out")(h))


class _Critic(nn.Module):
    @nn.compact
    def __call__(self, state, action):
        h = jnp.concatenate([state, action], axis=-1)
        h = nn.relu(nn.Dense(128, name="fc1")(h))
        h = nn.relu(nn.Dense(64, name="fc2")(h))
        return nn.Dense(1, name="out")(h)[..., 0]


def _unit(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def _drr_ave(emb: jnp.ndarray, hist: jnp.ndarray, n_items: int) -> jnp.ndarray:
    """Masked mean of history item embeddings (padding id = n_items maps to
    the zero row, reference StateReprModule padding_idx, ddpg.py:445)."""
    e = jnp.take(emb, hist, axis=0)  # [B, w, D]; padding row is zero
    count = jnp.sum((hist < n_items).astype(jnp.float32), axis=1, keepdims=True)
    return jnp.sum(e, axis=1) / jnp.maximum(count, 1.0)


class _StateRepr(nn.Module):
    """DRR state (reference StateReprModule, ddpg.py:425): user embedding,
    memory average, and their product through a linear projection."""

    n_users: int
    n_items: int
    dim: int

    @nn.compact
    def __call__(self, users, hist, item_emb):
        u = nn.Embed(
            self.n_users, self.dim,
            embedding_init=nn.initializers.normal(stddev=0.01), name="user_emb",
        )(users)
        ave = _drr_ave(item_emb, hist, self.n_items)

        # identity-on-ave init: the projection starts as state == ave (the
        # plain DRR-ave state, which trains stably) and learns the user and
        # interaction terms on top, rather than scrambling the state through
        # a random matrix from step 0
        def proj_init(key, shape, dtype=jnp.float32):
            del key
            k = jnp.zeros(shape, dtype)
            return k.at[2 * self.dim :, :].set(jnp.eye(self.dim, dtype=dtype))

        return nn.Dense(self.dim, kernel_init=proj_init, name="proj")(
            jnp.concatenate([u, u * ave, ave], axis=-1)
        )


class DDPG(Recommender):
    """Deterministic policy-gradient recommender (offline)."""

    # optimize() space over this formulation's knobs — the analog of the
    # reference DDPG's space (replay/experimental/models/ddpg.py:495:
    # gamma/value_lr/policy_lr/memory_size); noise/decay knobs have no
    # counterpart in the deterministic-actor JAX reformulation
    _search_space = {
        "gamma": {"type": "uniform", "args": [0.7, 1.0]},
        "actor_lr": {"type": "loguniform", "args": [1e-5, 1e-1]},
        "critic_lr": {"type": "loguniform", "args": [1e-5, 1e-1]},
        "state_window": {"type": "categorical", "args": [3, 5, 7, 9]},
    }

    def __init__(
        self,
        embedding_dim: int = 32,
        gamma: float = 0.9,
        tau: float = 0.01,
        actor_lr: float = 1e-3,
        critic_lr: float = 1e-3,
        embedding_lr: float = 1e-2,
        conservative_weight: float = 1.0,
        epochs: int = 10,
        batch_size: int = 512,
        state_window: int = 5,
        seed: Optional[int] = None,
    ):
        self.embedding_dim = embedding_dim
        self.gamma = gamma
        self.tau = tau
        self.actor_lr = actor_lr
        self.critic_lr = critic_lr
        self.embedding_lr = embedding_lr
        self.conservative_weight = conservative_weight
        self.epochs = epochs
        self.batch_size = batch_size
        self.state_window = state_window
        self._seed = seed

    @property
    def _init_args(self):
        return {
            "embedding_dim": self.embedding_dim,
            "gamma": self.gamma,
            "tau": self.tau,
            "actor_lr": self.actor_lr,
            "critic_lr": self.critic_lr,
            "embedding_lr": self.embedding_lr,
            "conservative_weight": self.conservative_weight,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "state_window": self.state_window,
            "seed": self._seed,
        }

    def _get_save_state(self):
        if not hasattr(self, "actor_params"):
            return {}
        np_tree = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        return {
            "actor_params": np_tree(self.actor_params),
            "state_params": np_tree(self.state_params),
            "item_embeddings": np.asarray(self.item_embeddings),
        }

    def _load_model(self, path: str):
        super()._load_model(path)
        if hasattr(self, "actor_params"):
            self._actor = _Actor(self.embedding_dim)
            self._state_repr = _StateRepr(
                n_users=len(self.fit_queries),
                n_items=len(self.fit_items),
                dim=self.embedding_dim,
            )

    def _transitions(self, dataset: Dataset):
        """Padded (history, action, reward, next_history) arrays from the log;
        histories are [N, state_window] right-aligned with padding id n_items."""
        inter = dataset.interactions
        sort_cols = [self.query_column]
        if self.timestamp_column in inter.columns:
            sort_cols.append(self.timestamp_column)
        frame = inter.sort_values(sort_cols, kind="stable")
        items = np.searchsorted(self.fit_items, frame[self.item_column].to_numpy())
        rewards = (
            frame[self.rating_column].to_numpy(dtype=np.float32)
            if self.rating_column in frame.columns
            else np.ones(len(frame), dtype=np.float32)
        )
        q = frame[self.query_column].to_numpy()
        uniq, starts = np.unique(q, return_index=True)
        offsets = np.append(starts, len(q))
        w = self.state_window
        pad = len(self.fit_items)
        hists, actions, rews, next_hists, users = [], [], [], [], []
        for u in range(len(uniq)):
            lo, hi = offsets[u], offsets[u + 1]
            seq = items[lo:hi]
            rew = rewards[lo:hi]
            urow = np.searchsorted(self.fit_queries, uniq[u])
            for t in range(1, len(seq)):
                h = seq[max(0, t - w) : t]
                h2 = seq[max(0, t + 1 - w) : t + 1]
                hists.append(np.pad(h, (w - len(h), 0), constant_values=pad))
                next_hists.append(np.pad(h2, (w - len(h2), 0), constant_values=pad))
                actions.append(seq[t])
                rews.append(rew[t])
                users.append(urow)
        return (
            np.asarray(hists, dtype=np.int32).reshape(-1, w),
            np.asarray(actions, dtype=np.int32),
            np.asarray(rews, dtype=np.float32),
            np.asarray(next_hists, dtype=np.int32).reshape(-1, w),
            np.asarray(users, dtype=np.int32),
        )

    def _fit(self, dataset: Dataset) -> None:
        rng = np.random.default_rng(self._seed)
        n_items = len(self.fit_items)
        n_users = len(self.fit_queries)
        dim = self.embedding_dim
        hists, actions, rewards, next_hists, users = self._transitions(dataset)

        actor, critic = _Actor(dim), _Critic()
        state_repr = _StateRepr(n_users=n_users, n_items=n_items, dim=dim)
        self._actor, self._state_repr = actor, state_repr
        key = jax.random.PRNGKey(self._seed or 0)
        # learned table; last row = padding, zero-initialized (reference
        # StateReprModule init, ddpg.py:453-456)
        emb = jnp.asarray(
            np.concatenate(
                [
                    rng.normal(0, 0.01, (n_items, dim)).astype(np.float32),
                    np.zeros((1, dim), dtype=np.float32),
                ]
            )
        )
        dummy_u = jnp.zeros((1,), jnp.int32)
        dummy_h = jnp.zeros((1, self.state_window), jnp.int32)
        s_params = state_repr.init(key, dummy_u, dummy_h, emb)["params"]
        a_params = actor.init(key, jnp.zeros((1, dim)))["params"]
        c_params = critic.init(key, jnp.zeros((1, dim)), jnp.zeros((1, dim)))["params"]
        a_target, c_target, emb_target, s_target = a_params, c_params, emb, s_params
        a_tx = optax.adam(self.actor_lr)
        c_tx = optax.adam(self.critic_lr)
        # weight decay keeps the table from encoding the logged/random
        # distinction in embedding NORMS alone (a degenerate collapse mode);
        # action vectors are unit-normalized in the critic for the same reason
        e_tx = optax.adamw(self.embedding_lr, weight_decay=1e-4)
        s_tx = optax.adam(self.actor_lr)
        a_opt, c_opt = a_tx.init(a_params), c_tx.init(c_params)
        e_opt, s_opt = e_tx.init(emb), s_tx.init(s_params)
        gamma, tau = jnp.float32(self.gamma), jnp.float32(self.tau)
        cons_w = jnp.float32(self.conservative_weight)

        @jax.jit
        def step(
            a_params, c_params, emb, s_params,
            a_target, c_target, emb_target, s_target,
            a_opt, c_opt, e_opt, s_opt,
            user, hist, act, r, hist2, neg_act,
        ):
            # TD target from the target networks/table (all stop-grad)
            s2 = state_repr.apply({"params": s_target}, user, hist2, emb_target)
            a2 = _unit(actor.apply({"params": a_target}, s2))
            q_target = jax.lax.stop_gradient(
                r + gamma * critic.apply({"params": c_target}, s2, a2)
            )

            def critic_loss(cp, e, sp):
                s = state_repr.apply({"params": sp}, user, hist, e)
                a = _unit(jnp.take(e, act, axis=0))
                q = critic.apply({"params": cp}, s, a)
                td = jnp.mean((q - q_target) ** 2)
                # conservative penalty: Q of random (OOD) actions → 0
                a_neg = _unit(jnp.take(e, neg_act, axis=0))
                q_neg = critic.apply({"params": cp}, s, a_neg)
                return td + cons_w * jnp.mean(q_neg**2)

            c_grads, e_grads_c, s_grads_c = jax.grad(critic_loss, argnums=(0, 1, 2))(
                c_params, emb, s_params
            )
            c_updates, c_opt = c_tx.update(c_grads, c_opt)
            c_params = optax.apply_updates(c_params, c_updates)

            def actor_loss(ap, e, sp):
                s = state_repr.apply({"params": sp}, user, hist, e)
                return -jnp.mean(
                    critic.apply(
                        {"params": c_params}, s, _unit(actor.apply({"params": ap}, s))
                    )
                )

            a_grads, e_grads_a, s_grads_a = jax.grad(actor_loss, argnums=(0, 1, 2))(
                a_params, emb, s_params
            )
            a_updates, a_opt = a_tx.update(a_grads, a_opt)
            a_params = optax.apply_updates(a_params, a_updates)

            # embeddings + state projection learn from both losses (reference
            # trains them inside ActorDRR with the joint backward, :742-749)
            e_updates, e_opt = e_tx.update(e_grads_c + e_grads_a, e_opt, emb)
            emb = optax.apply_updates(emb, e_updates)
            # keep the padding row at zero
            emb = emb.at[n_items].set(0.0)
            s_grads = jax.tree_util.tree_map(
                lambda g1, g2: g1 + g2, s_grads_c, s_grads_a
            )
            s_updates, s_opt = s_tx.update(s_grads, s_opt)
            s_params = optax.apply_updates(s_params, s_updates)

            polyak = lambda t, p: jax.tree_util.tree_map(  # noqa: E731
                lambda x, y: (1 - tau) * x + tau * y, t, p
            )
            return (
                a_params, c_params, emb, s_params,
                polyak(a_target, a_params), polyak(c_target, c_params),
                polyak(emb_target, emb), polyak(s_target, s_params),
                a_opt, c_opt, e_opt, s_opt,
            )

        n = len(hists)
        bsz = min(self.batch_size, n)
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                (
                    a_params, c_params, emb, s_params,
                    a_target, c_target, emb_target, s_target,
                    a_opt, c_opt, e_opt, s_opt,
                ) = step(
                    a_params, c_params, emb, s_params,
                    a_target, c_target, emb_target, s_target,
                    a_opt, c_opt, e_opt, s_opt,
                    jnp.asarray(users[rows]),
                    jnp.asarray(hists[rows]),
                    jnp.asarray(actions[rows]),
                    jnp.asarray(rewards[rows]),
                    jnp.asarray(next_hists[rows]),
                    jnp.asarray(rng.integers(0, n_items, size=bsz, dtype=np.int32)),
                )
        self.actor_params = a_params
        self.state_params = s_params
        self.item_embeddings = np.asarray(emb[:n_items])

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None:
            msg = "DDPG needs dataset interactions at predict time"
            raise ValueError(msg)
        inter = dataset.interactions
        sub = inter[inter[self.query_column].isin(query_ids)]
        known = np.isin(sub[self.item_column].to_numpy(), self.fit_items)
        sub = sub[known]
        w = self.state_window
        pad = len(self.fit_items)
        grouped = sub.groupby(self.query_column)[self.item_column].agg(list)
        hists = np.full((len(query_ids), w), pad, dtype=np.int32)
        for row, q in enumerate(query_ids):
            h = np.searchsorted(self.fit_items, grouped.get(q, [])[-w:])
            if len(h):
                hists[row, w - len(h) :] = h
        emb_full = np.concatenate(
            [self.item_embeddings, np.zeros((1, self.item_embeddings.shape[1]), np.float32)]
        )
        user_rows = np.searchsorted(self.fit_queries, query_ids).astype(np.int32)
        states = self._state_repr.apply(
            {"params": self.state_params},
            jnp.asarray(user_rows), jnp.asarray(hists), jnp.asarray(emb_full),
        )
        action = np.asarray(self._actor.apply({"params": self.actor_params}, states))
        item_pos = np.searchsorted(self.fit_items, item_ids)
        item_vecs = np.asarray(_unit(jnp.asarray(self.item_embeddings[item_pos])))
        return action @ item_vecs.T
