"""DDPG actor-critic recommender.

TPU-native analog of the reference (reference:
replay/experimental/models/ddpg.py:475 — ActorDRR/CriticDRR, replay
buffer, Ornstein-Uhlenbeck noise; ~932 LoC of torch).  Offline variant:

- **state**: mean of the user's recent item embeddings (the reference's
  DRR-ave state representation);
- **actor**: MLP state → action vector in item-embedding space;
- **critic**: MLP Q(state, action);
- offline transitions from the log (state built from the history prefix,
  action = the interacted item's embedding, reward = rating), trained with
  the standard DDPG losses against target networks (polyak-averaged);
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


class DDPG(Recommender):
    """Deterministic policy-gradient recommender (offline)."""

    def __init__(
        self,
        embedding_dim: int = 32,
        gamma: float = 0.9,
        tau: float = 0.01,
        actor_lr: float = 1e-3,
        critic_lr: float = 1e-3,
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
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "state_window": self.state_window,
            "seed": self._seed,
        }

    def _transitions(self, dataset: Dataset):
        """(state, action_item, reward, next_state) from history prefixes."""
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
        states, actions, rews, next_states = [], [], [], []
        w = self.state_window
        for u in range(len(uniq)):
            lo, hi = offsets[u], offsets[u + 1]
            seq = items[lo:hi]
            rew = rewards[lo:hi]
            for t in range(1, len(seq)):
                states.append(seq[max(0, t - w) : t])
                actions.append(seq[t])
                rews.append(rew[t])
                next_states.append(seq[max(0, t + 1 - w) : t + 1])
        return states, np.asarray(actions), np.asarray(rews), next_states

    def _state_matrix(self, histories, item_emb: np.ndarray) -> np.ndarray:
        out = np.zeros((len(histories), item_emb.shape[1]), dtype=np.float32)
        for r, h in enumerate(histories):
            if len(h):
                out[r] = item_emb[np.asarray(h)].mean(axis=0)
        return out

    def _fit(self, dataset: Dataset) -> None:
        rng = np.random.default_rng(self._seed)
        n_items = len(self.fit_items)
        dim = self.embedding_dim
        self.item_embeddings = rng.normal(0, 1.0 / np.sqrt(dim), (n_items, dim)).astype(
            np.float32
        )
        states_h, actions, rewards, next_h = self._transitions(dataset)
        states = self._state_matrix(states_h, self.item_embeddings)
        next_states = self._state_matrix(next_h, self.item_embeddings)
        action_vecs = self.item_embeddings[actions]

        actor, critic = _Actor(dim), _Critic()
        self._actor = actor
        key = jax.random.PRNGKey(self._seed or 0)
        a_params = actor.init(key, jnp.zeros((1, dim)))["params"]
        c_params = critic.init(key, jnp.zeros((1, dim)), jnp.zeros((1, dim)))["params"]
        a_target, c_target = a_params, c_params
        a_tx, c_tx = optax.adam(self.actor_lr), optax.adam(self.critic_lr)
        a_opt, c_opt = a_tx.init(a_params), c_tx.init(c_params)
        gamma, tau = jnp.float32(self.gamma), jnp.float32(self.tau)

        @jax.jit
        def step(a_params, c_params, a_target, c_target, a_opt, c_opt, s, a, r, s2):
            # critic: TD target from target nets
            a2 = actor.apply({"params": a_target}, s2)
            q_target = r + gamma * critic.apply({"params": c_target}, s2, a2)

            def critic_loss(cp):
                q = critic.apply({"params": cp}, s, a)
                return jnp.mean((q - jax.lax.stop_gradient(q_target)) ** 2)

            c_loss, c_grads = jax.value_and_grad(critic_loss)(c_params)
            c_updates, c_opt = c_tx.update(c_grads, c_opt)
            c_params = optax.apply_updates(c_params, c_updates)

            def actor_loss(ap):
                return -jnp.mean(
                    critic.apply({"params": c_params}, s, actor.apply({"params": ap}, s))
                )

            a_loss, a_grads = jax.value_and_grad(actor_loss)(a_params)
            a_updates, a_opt = a_tx.update(a_grads, a_opt)
            a_params = optax.apply_updates(a_params, a_updates)

            polyak = lambda t, p: jax.tree_util.tree_map(  # noqa: E731
                lambda x, y: (1 - tau) * x + tau * y, t, p
            )
            return a_params, c_params, polyak(a_target, a_params), polyak(c_target, c_params), a_opt, c_opt

        n = len(states)
        bsz = min(self.batch_size, n)
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                a_params, c_params, a_target, c_target, a_opt, c_opt = step(
                    a_params, c_params, a_target, c_target, a_opt, c_opt,
                    jnp.asarray(states[rows]),
                    jnp.asarray(action_vecs[rows]),
                    jnp.asarray(rewards[rows]),
                    jnp.asarray(next_states[rows]),
                )
        self.actor_params = a_params

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None:
            msg = "DDPG needs dataset interactions at predict time"
            raise ValueError(msg)
        inter = dataset.interactions
        sub = inter[inter[self.query_column].isin(query_ids)]
        known = np.isin(sub[self.item_column].to_numpy(), self.fit_items)
        sub = sub[known]
        histories = []
        grouped = sub.groupby(self.query_column)[self.item_column].agg(list)
        for q in query_ids:
            h = grouped.get(q, [])
            histories.append(np.searchsorted(self.fit_items, h[-self.state_window :]))
        states = self._state_matrix(histories, self.item_embeddings)
        action = np.asarray(self._actor.apply({"params": self.actor_params}, jnp.asarray(states)))
        item_pos = np.searchsorted(self.fit_items, item_ids)
        return action @ self.item_embeddings[item_pos].T
