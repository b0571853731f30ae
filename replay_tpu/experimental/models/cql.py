"""CQL: conservative Q-learning recommender (Kumar et al., arXiv 2006.04779).

TPU-native analog of the reference (reference:
replay/experimental/models/cql.py:43 CQL + MdpDatasetBuilder :396, which
wraps d3rlpy).  Here discrete CQL is implemented directly in jax: the log
is converted to an MDP (the reference's MdpDatasetBuilder semantics —
state = mean embedding of recent history, action = item, reward = rating,
episode per user), and a Q-network is trained with the double-DQN TD loss
plus the CQL conservative term α·(logsumexp_a Q(s,a) − Q(s, a_data)).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender


class _QNet(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, state):
        h = nn.relu(nn.Dense(128, name="fc1")(state))
        h = nn.relu(nn.Dense(128, name="fc2")(h))
        return nn.Dense(self.n_actions, name="out")(h)


class CQL(Recommender):
    """Discrete conservative Q-learning over user-history states."""

    def __init__(
        self,
        embedding_dim: int = 32,
        gamma: float = 0.9,
        alpha: float = 1.0,
        learning_rate: float = 1e-3,
        epochs: int = 10,
        batch_size: int = 512,
        state_window: int = 5,
        target_update_every: int = 100,
        seed: Optional[int] = None,
    ):
        self.embedding_dim = embedding_dim
        self.gamma = gamma
        self.alpha = alpha
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.batch_size = batch_size
        self.state_window = state_window
        self.target_update_every = target_update_every
        self._seed = seed

    @property
    def _init_args(self):
        return {
            "embedding_dim": self.embedding_dim,
            "gamma": self.gamma,
            "alpha": self.alpha,
            "learning_rate": self.learning_rate,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "state_window": self.state_window,
            "target_update_every": self.target_update_every,
            "seed": self._seed,
        }

    def _mdp(self, dataset: Dataset):
        """Transitions (state, action, reward, next_state, done) per user
        episode — the reference's MdpDatasetBuilder (cql.py:396)."""
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
        st, ac, rw, st2, dn = [], [], [], [], []
        for u in range(len(uniq)):
            lo, hi = offsets[u], offsets[u + 1]
            seq, rew = items[lo:hi], rewards[lo:hi]
            for t in range(len(seq)):
                st.append(seq[max(0, t - w) : t])
                ac.append(seq[t])
                rw.append(rew[t])
                st2.append(seq[max(0, t + 1 - w) : t + 1])
                dn.append(1.0 if t == len(seq) - 1 else 0.0)
        return st, np.asarray(ac), np.asarray(rw, np.float32), st2, np.asarray(dn, np.float32)

    def _state_matrix(self, histories) -> np.ndarray:
        out = np.zeros((len(histories), self.embedding_dim), dtype=np.float32)
        for r, h in enumerate(histories):
            if len(h):
                out[r] = self.item_embeddings[np.asarray(h)].mean(axis=0)
        return out

    def _fit(self, dataset: Dataset) -> None:
        rng = np.random.default_rng(self._seed)
        n_items = len(self.fit_items)
        dim = self.embedding_dim
        self.item_embeddings = rng.normal(0, 1.0 / np.sqrt(dim), (n_items, dim)).astype(
            np.float32
        )
        st_h, actions, rewards, st2_h, dones = self._mdp(dataset)
        states = self._state_matrix(st_h)
        next_states = self._state_matrix(st2_h)

        qnet = _QNet(n_actions=n_items)
        self._qnet = qnet
        key = jax.random.PRNGKey(self._seed or 0)
        params = qnet.init(key, jnp.zeros((1, dim)))["params"]
        target = params
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init(params)
        gamma, alpha = jnp.float32(self.gamma), jnp.float32(self.alpha)

        @jax.jit
        def step(params, target, opt_state, s, a, r, s2, d):
            def loss_fn(p):
                q = qnet.apply({"params": p}, s)
                q_sa = jnp.take_along_axis(q, a[:, None], axis=1)[:, 0]
                # double DQN target
                next_q_online = qnet.apply({"params": p}, s2)
                next_a = jnp.argmax(next_q_online, axis=1)
                next_q = qnet.apply({"params": target}, s2)
                next_q_sa = jnp.take_along_axis(next_q, next_a[:, None], axis=1)[:, 0]
                td_target = r + gamma * (1.0 - d) * jax.lax.stop_gradient(next_q_sa)
                td = jnp.mean((q_sa - td_target) ** 2)
                # conservative penalty
                cql = jnp.mean(jax.nn.logsumexp(q, axis=1) - q_sa)
                return td + alpha * cql

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        n = len(states)
        bsz = min(self.batch_size, n)
        step_no = 0
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                params, opt_state, _ = step(
                    params, target, opt_state,
                    jnp.asarray(states[rows]),
                    jnp.asarray(actions[rows]),
                    jnp.asarray(rewards[rows]),
                    jnp.asarray(next_states[rows]),
                    jnp.asarray(dones[rows]),
                )
                step_no += 1
                if step_no % self.target_update_every == 0:
                    target = params
        self.params = params

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None:
            msg = "CQL needs dataset interactions at predict time"
            raise ValueError(msg)
        inter = dataset.interactions
        sub = inter[inter[self.query_column].isin(query_ids)]
        known = np.isin(sub[self.item_column].to_numpy(), self.fit_items)
        sub = sub[known]
        grouped = sub.groupby(self.query_column)[self.item_column].agg(list)
        histories = [
            np.searchsorted(self.fit_items, grouped.get(q, [])[-self.state_window :])
            for q in query_ids
        ]
        states = self._state_matrix(histories)
        q = np.asarray(self._qnet.apply({"params": self.params}, jnp.asarray(states)))
        item_pos = np.searchsorted(self.fit_items, item_ids)
        return q[:, item_pos]
