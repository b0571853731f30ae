"""CQL: conservative Q-learning recommender (Kumar et al., arXiv 2006.04779).

TPU-native analog of the reference (reference:
replay/experimental/models/cql.py:43 CQL + MdpDatasetBuilder :396, which
wraps d3rlpy's SAC-based continuous CQL).  Two models:

- :class:`CQL` — reference-semantics **continuous** CQL, implemented
  natively in jax instead of wrapping d3rlpy:
  * ``MdpDatasetBuilder(top_k, action_randomization_scale)`` (reference
    :411): observation = (user_idx, item_idx), action = relevance +
    gaussian noise, reward = 1 for the user's top-k rows by
    (relevance desc, timestamp desc) else 0, terminal at each user's last
    interaction by time;
  * tanh-gaussian actor, ``n_critics`` Q ensemble (min-backup), SAC
    temperature auto-tuned to the -|A| entropy target, and the CQL
    conservative term — logsumexp over ``n_action_samples`` uniform +
    policy actions with importance weights — weighted by a Lagrangian
    ``alpha`` tuned against ``alpha_threshold`` (the d3rlpy algorithm the
    reference delegates to);
  * soft target updates with coefficient ``tau``; every update is one
    jitted step over static-shape batches.
  Actions are min-max normalized to [-1, 1] for the tanh policy and
  de-normalized at predict; observations are standard-scaled (the
  reference exposes the same scalers as config options).
  Predict scores a (user, item) pair with the deterministic policy action
  (reference ``_predict_relevance_with_policy`` :390).

- :class:`DiscreteCQL` — a discrete double-DQN + conservative-penalty
  variant over mean-embedding history states (kept from round 1; the
  d3rlpy library the reference builds on ships the same discrete twin).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

_LOG_STD_MIN, _LOG_STD_MAX = -20.0, 2.0


class MdpDatasetBuilder:
    """Users' log → MDP transitions (reference: cql.py:396).

    :param top_k: rows ranked in the user's top-k by (relevance desc,
        timestamp desc) get reward 1, the rest 0.
    :param action_randomization_scale: std of the gaussian noise added to
        relevance to form continuous actions (must be > 0).
    """

    def __init__(self, top_k: int, action_randomization_scale: float = 1e-3):
        if action_randomization_scale <= 0:
            msg = "action_randomization_scale must be positive"
            raise ValueError(msg)
        self.top_k = top_k
        self.action_randomization_scale = action_randomization_scale

    def build(self, frame, query_column, item_column, rating_column,
              timestamp_column, rng):
        """:returns: (observations [N, 2], actions [N, 1], rewards [N],
        terminals [N]) ordered by (user, time)."""
        cols = [query_column]
        has_ts = timestamp_column in frame.columns
        if has_ts:
            cols.append(timestamp_column)
        frame = frame.sort_values(cols, kind="stable")
        ratings = (
            frame[rating_column].to_numpy(dtype=np.float64)
            if rating_column in frame.columns
            else np.ones(len(frame), dtype=np.float64)
        )
        ts = (
            frame[timestamp_column].to_numpy(dtype=np.float64)
            if has_ts
            else np.zeros(len(frame))
        )
        users = frame[query_column].to_numpy()
        uniq, starts = np.unique(users, return_index=True)
        offsets = np.append(starts, len(users))

        rewards = np.zeros(len(frame), dtype=np.float32)
        terminals = np.zeros(len(frame), dtype=np.float32)
        for u in range(len(uniq)):
            lo, hi = offsets[u], offsets[u + 1]
            # top-k by (relevance desc, timestamp desc)
            order = np.lexsort((-ts[lo:hi], -ratings[lo:hi]))
            rewards[lo + order[: self.top_k]] = 1.0
            terminals[hi - 1] = 1.0  # frame is time-sorted within the user

        actions = ratings.astype(np.float32) + rng.normal(
            0.0, self.action_randomization_scale, len(frame)
        ).astype(np.float32)
        return frame, actions[:, None], rewards, terminals

    def init_args(self):
        return {
            "top_k": self.top_k,
            "action_randomization_scale": self.action_randomization_scale,
        }


class _Actor(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, obs):
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(obs))
        h = nn.relu(nn.Dense(self.hidden, name="fc2")(h))
        mu = nn.Dense(1, name="mu")(h)
        log_std = jnp.clip(nn.Dense(1, name="log_std")(h), _LOG_STD_MIN, _LOG_STD_MAX)
        return mu, log_std


class _Critic(nn.Module):
    n_critics: int = 2
    hidden: int = 256

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        qs = []
        for c in range(self.n_critics):
            h = nn.relu(nn.Dense(self.hidden, name=f"q{c}_fc1")(x))
            h = nn.relu(nn.Dense(self.hidden, name=f"q{c}_fc2")(h))
            qs.append(nn.Dense(1, name=f"q{c}_out")(h)[..., 0])
        return jnp.stack(qs)  # [n_critics, B]


def _squash(mu, log_std, key):
    """Tanh-gaussian sample with log-prob (SAC reparameterization)."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    act = jnp.tanh(pre)
    logp = (
        -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        - jnp.log(jnp.maximum(1 - act**2, 1e-6))
    ).sum(-1)
    return act, logp


class CQL(Recommender):
    """Continuous SAC-based conservative Q-learning (reference parity)."""

    _search_space = {
        "actor_learning_rate": {"type": "loguniform", "args": [1e-5, 1e-3]},
        "critic_learning_rate": {"type": "loguniform", "args": [3e-5, 3e-4]},
        "gamma": {"type": "loguniform", "args": [0.9, 0.999]},
        "n_critics": {"type": "int", "args": [2, 4]},
    }

    def __init__(
        self,
        mdp_dataset_builder: Optional[MdpDatasetBuilder] = None,
        actor_learning_rate: float = 1e-4,
        critic_learning_rate: float = 3e-4,
        temp_learning_rate: float = 1e-4,
        alpha_learning_rate: float = 1e-4,
        batch_size: int = 64,
        n_steps: int = 1000,
        gamma: float = 0.99,
        tau: float = 0.005,
        n_critics: int = 2,
        initial_temperature: float = 1.0,
        initial_alpha: float = 1.0,
        alpha_threshold: float = 10.0,
        conservative_weight: float = 5.0,
        n_action_samples: int = 10,
        soft_q_backup: bool = False,
        hidden_dim: int = 256,
        seed: Optional[int] = None,
    ):
        if isinstance(mdp_dataset_builder, dict):  # restored from init_args
            mdp_dataset_builder = MdpDatasetBuilder(**mdp_dataset_builder)
        self.mdp_dataset_builder = mdp_dataset_builder or MdpDatasetBuilder(top_k=10)
        self.actor_learning_rate = actor_learning_rate
        self.critic_learning_rate = critic_learning_rate
        self.temp_learning_rate = temp_learning_rate
        self.alpha_learning_rate = alpha_learning_rate
        self.batch_size = batch_size
        self.n_steps = n_steps
        self.gamma = gamma
        self.tau = tau
        self.n_critics = n_critics
        self.initial_temperature = initial_temperature
        self.initial_alpha = initial_alpha
        self.alpha_threshold = alpha_threshold
        self.conservative_weight = conservative_weight
        self.n_action_samples = n_action_samples
        self.soft_q_backup = soft_q_backup
        self.hidden_dim = hidden_dim
        self._seed = seed

    @property
    def _init_args(self):
        return {
            "mdp_dataset_builder": self.mdp_dataset_builder.init_args(),
            "actor_learning_rate": self.actor_learning_rate,
            "critic_learning_rate": self.critic_learning_rate,
            "temp_learning_rate": self.temp_learning_rate,
            "alpha_learning_rate": self.alpha_learning_rate,
            "batch_size": self.batch_size,
            "n_steps": self.n_steps,
            "gamma": self.gamma,
            "tau": self.tau,
            "n_critics": self.n_critics,
            "initial_temperature": self.initial_temperature,
            "initial_alpha": self.initial_alpha,
            "alpha_threshold": self.alpha_threshold,
            "conservative_weight": self.conservative_weight,
            "n_action_samples": self.n_action_samples,
            "soft_q_backup": self.soft_q_backup,
            "hidden_dim": self.hidden_dim,
            "seed": self._seed,
        }

    def _get_save_state(self):
        if not hasattr(self, "actor_params"):
            return {}
        return {
            "actor_params": jax.tree_util.tree_map(np.asarray, self.actor_params),
            "_obs_mean": np.asarray(self._obs_mean),
            "_obs_std": np.asarray(self._obs_std),
            "_act_lo": self._act_lo,
            "_act_hi": self._act_hi,
        }

    def _load_model(self, path: str):
        super()._load_model(path)
        if hasattr(self, "actor_params"):
            self._actor = _Actor(hidden=self.hidden_dim)

    def _encode_obs(self, query_ids, item_ids):
        """(user, item) → standard-scaled float observations."""
        u = np.searchsorted(self.fit_queries, query_ids).astype(np.float32)
        i = np.searchsorted(self.fit_items, item_ids).astype(np.float32)
        obs = np.stack([u, i], axis=1)
        return (obs - self._obs_mean) / self._obs_std

    def _fit(self, dataset: Dataset) -> None:
        rng = np.random.default_rng(self._seed)
        inter = dataset.interactions
        frame, actions, rewards, terminals = self.mdp_dataset_builder.build(
            inter, self.query_column, self.item_column, self.rating_column,
            self.timestamp_column, rng,
        )
        # (user, item) observations, encoded then standard-scaled
        u = np.searchsorted(
            self.fit_queries, frame[self.query_column].to_numpy()
        ).astype(np.float32)
        i = np.searchsorted(
            self.fit_items, frame[self.item_column].to_numpy()
        ).astype(np.float32)
        obs = np.stack([u, i], axis=1)
        self._obs_mean = obs.mean(axis=0)
        self._obs_std = np.maximum(obs.std(axis=0), 1e-6)
        obs = (obs - self._obs_mean) / self._obs_std

        # min-max normalize actions into the tanh policy's [-1, 1]
        self._act_lo = float(actions.min())
        self._act_hi = float(max(actions.max(), self._act_lo + 1e-6))
        act_norm = 2.0 * (actions - self._act_lo) / (self._act_hi - self._act_lo) - 1.0
        act_norm = np.clip(act_norm, -1.0 + 1e-4, 1.0 - 1e-4).astype(np.float32)

        # next-state pairing: within a user episode the next row; terminal
        # rows bootstrap nothing
        next_obs = np.concatenate([obs[1:], obs[-1:]], axis=0)
        new_user = np.concatenate([(u[1:] != u[:-1]).astype(np.float32), [1.0]])
        done = np.maximum(terminals, new_user)

        actor = _Actor(hidden=self.hidden_dim)
        critic = _Critic(n_critics=self.n_critics, hidden=self.hidden_dim)
        self._actor, self._critic = actor, critic

        key = jax.random.PRNGKey(self._seed or 0)
        ka, kc = jax.random.split(key)
        dummy_o = jnp.zeros((1, 2))
        dummy_a = jnp.zeros((1, 1))
        actor_params = actor.init(ka, dummy_o)["params"]
        critic_params = critic.init(kc, dummy_o, dummy_a)["params"]
        target_params = critic_params
        log_temp = jnp.asarray(np.log(self.initial_temperature), jnp.float32)
        log_alpha = jnp.asarray(np.log(self.initial_alpha), jnp.float32)

        tx_actor = optax.adam(self.actor_learning_rate)
        tx_critic = optax.adam(self.critic_learning_rate)
        tx_temp = optax.adam(self.temp_learning_rate)
        tx_alpha = optax.adam(self.alpha_learning_rate)
        st_actor = tx_actor.init(actor_params)
        st_critic = tx_critic.init(critic_params)
        st_temp = tx_temp.init(log_temp)
        st_alpha = tx_alpha.init(log_alpha)

        gamma = jnp.float32(self.gamma)
        tau = jnp.float32(self.tau)
        n_samp = self.n_action_samples
        cw = jnp.float32(self.conservative_weight)
        thr = jnp.float32(self.alpha_threshold)
        target_entropy = -1.0  # -|A|, action_dim = 1

        @jax.jit
        def update(carry, batch):
            (actor_p, critic_p, target_p, log_temp, log_alpha,
             st_a, st_c, st_t, st_al, key) = carry
            o, a, r, o2, d = batch
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            temp = jnp.exp(log_temp)

            # ---- critic update (+ CQL conservative term)
            mu2, ls2 = actor.apply({"params": actor_p}, o2)
            a2, logp2 = _squash(mu2, ls2, k1)
            q_next = critic.apply({"params": target_p}, o2, a2).min(axis=0)
            if self.soft_q_backup:
                q_next = q_next - temp * logp2
            td_target = r + gamma * (1.0 - d) * jax.lax.stop_gradient(q_next)

            def critic_loss_fn(cp):
                qs = critic.apply({"params": cp}, o, a)  # [C, B]
                td = jnp.mean((qs - td_target[None]) ** 2)

                # conservative term: logsumexp over uniform + policy actions
                b = o.shape[0]
                a_unif = jax.random.uniform(k2, (n_samp, b, 1), minval=-1.0, maxval=1.0)
                mu_c, ls_c = actor.apply({"params": actor_p}, o)
                a_pol, logp_pol = _squash(
                    mu_c[None].repeat(n_samp, 0), ls_c[None].repeat(n_samp, 0), k3
                )  # [S, B, 1], [S, B]
                o_tiled = jnp.broadcast_to(o[None], (n_samp, b, o.shape[1])).reshape(
                    n_samp * b, -1
                )
                q_unif = critic.apply(
                    {"params": cp}, o_tiled, a_unif.reshape(n_samp * b, 1)
                ).reshape(-1, n_samp, b)  # [C, S, B]
                q_pol = critic.apply(
                    {"params": cp}, o_tiled, a_pol.reshape(n_samp * b, 1)
                ).reshape(-1, n_samp, b)
                # importance weights: log 0.5 uniform density / policy logp
                lw_unif = q_unif - jnp.log(0.5)
                lw_pol = q_pol - jax.lax.stop_gradient(logp_pol)[None]
                cat = jnp.concatenate([lw_unif, lw_pol], axis=1)  # [C, 2S, B]
                lse = jax.nn.logsumexp(cat, axis=1) - jnp.log(2.0 * n_samp)
                gap = jnp.mean(lse - qs)  # push down OOD, push up data actions
                return td + jnp.exp(log_alpha) * cw * gap, gap

            (c_loss, gap), c_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
                critic_p
            )
            c_up, st_c = tx_critic.update(c_grads, st_c)
            critic_p = optax.apply_updates(critic_p, c_up)

            # ---- conservative alpha (Lagrangian: gap vs threshold)
            def alpha_loss_fn(la):
                return -jnp.exp(la) * (jax.lax.stop_gradient(gap) - thr)

            al_grad = jax.grad(alpha_loss_fn)(log_alpha)
            al_up, st_al = tx_alpha.update(al_grad, st_al)
            log_alpha = optax.apply_updates(log_alpha, al_up)

            # ---- actor update
            def actor_loss_fn(ap):
                mu_a, ls_a = actor.apply({"params": ap}, o)
                a_new, logp = _squash(mu_a, ls_a, k4)
                q = critic.apply({"params": critic_p}, o, a_new).min(axis=0)
                return jnp.mean(temp * logp - q), logp

            (a_loss, logp), a_grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
                actor_p
            )
            a_up, st_a = tx_actor.update(a_grads, st_a)
            actor_p = optax.apply_updates(actor_p, a_up)

            # ---- SAC temperature
            def temp_loss_fn(lt):
                return -jnp.exp(lt) * jnp.mean(
                    jax.lax.stop_gradient(logp) + target_entropy
                )

            t_grad = jax.grad(temp_loss_fn)(log_temp)
            t_up, st_t = tx_temp.update(t_grad, st_t)
            log_temp = optax.apply_updates(log_temp, t_up)

            # ---- soft target update
            target_p = jax.tree_util.tree_map(
                lambda t, p: (1 - tau) * t + tau * p, target_p, critic_p
            )
            return (
                actor_p, critic_p, target_p, log_temp, log_alpha,
                st_a, st_c, st_t, st_al, key,
            ), c_loss

        carry = (
            actor_params, critic_params, target_params, log_temp, log_alpha,
            st_actor, st_critic, st_temp, st_alpha, key,
        )
        n = len(obs)
        bsz = min(self.batch_size, n)
        for _step in range(self.n_steps):
            rows = rng.integers(0, n, bsz)
            batch = (
                jnp.asarray(obs[rows]),
                jnp.asarray(act_norm[rows]),
                jnp.asarray(rewards[rows]),
                jnp.asarray(next_obs[rows]),
                jnp.asarray(done[rows]),
            )
            carry, _ = update(carry, batch)
        (self.actor_params, self.critic_params, *_rest) = carry

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        b, m = len(query_ids), len(item_ids)
        qq = np.repeat(query_ids, m)
        ii = np.tile(item_ids, b)
        obs = jnp.asarray(self._encode_obs(qq, ii))
        mu, _ = self._actor.apply({"params": self.actor_params}, obs)
        act = np.asarray(jnp.tanh(mu))[:, 0]
        # de-normalize to the relevance scale
        rel = (act + 1.0) / 2.0 * (self._act_hi - self._act_lo) + self._act_lo
        return rel.reshape(b, m)


class _QNet(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, state):
        h = nn.relu(nn.Dense(128, name="fc1")(state))
        h = nn.relu(nn.Dense(128, name="fc2")(h))
        return nn.Dense(self.n_actions, name="out")(h)


class DiscreteCQL(Recommender):
    """Discrete conservative Q-learning over user-history states.

    Double-DQN TD loss plus the discrete CQL penalty
    α·(logsumexp_a Q(s,a) − Q(s, a_data)); state = mean embedding of the
    last ``state_window`` items where the item table is LEARNED jointly
    with the Q-network (the analog of d3rlpy's DiscreteCQL training its
    observation encoder end-to-end)."""

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
        episode."""
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
        st, ac, rw, st2, dn = [], [], [], [], []
        for u in range(len(uniq)):
            lo, hi = offsets[u], offsets[u + 1]
            seq, rew = items[lo:hi], rewards[lo:hi]
            for t in range(len(seq)):
                h = seq[max(0, t - w) : t]
                h2 = seq[max(0, t + 1 - w) : t + 1]
                st.append(np.pad(h, (w - len(h), 0), constant_values=pad))
                ac.append(seq[t])
                rw.append(rew[t])
                st2.append(np.pad(h2, (w - len(h2), 0), constant_values=pad))
                dn.append(1.0 if t == len(seq) - 1 else 0.0)
        return (
            np.asarray(st, dtype=np.int32).reshape(-1, w),
            np.asarray(ac),
            np.asarray(rw, np.float32),
            np.asarray(st2, dtype=np.int32).reshape(-1, w),
            np.asarray(dn, np.float32),
        )

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
        hists, actions, rewards, next_hists, dones = self._mdp(dataset)

        qnet = _QNet(n_actions=n_items)
        self._qnet = qnet
        key = jax.random.PRNGKey(self._seed or 0)
        params = qnet.init(key, jnp.zeros((1, dim)))["params"]
        # the state encoder (item table) trains jointly with the Q-net, the
        # way d3rlpy's DiscreteCQL trains its observation encoder; last row
        # is the zero padding vector
        emb = jnp.asarray(
            np.concatenate(
                [
                    rng.normal(0, 1.0 / np.sqrt(dim), (n_items, dim)).astype(np.float32),
                    np.zeros((1, dim), dtype=np.float32),
                ]
            )
        )
        target, emb_target = params, emb
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init((params, emb))
        gamma, alpha = jnp.float32(self.gamma), jnp.float32(self.alpha)

        def state_of(e, hist):
            vecs = jnp.take(e, hist, axis=0)  # padding row is zero
            count = jnp.sum((hist < n_items).astype(jnp.float32), axis=1, keepdims=True)
            return jnp.sum(vecs, axis=1) / jnp.maximum(count, 1.0)

        @jax.jit
        def step(params, emb, target, emb_target, opt_state, hist, a, r, hist2, d):
            def loss_fn(pe):
                p, e = pe
                q = qnet.apply({"params": p}, state_of(e, hist))
                q_sa = jnp.take_along_axis(q, a[:, None], axis=1)[:, 0]
                # double DQN target from the target net + target table
                s2 = state_of(emb_target, hist2)
                next_q_online = qnet.apply({"params": p}, s2)
                next_a = jnp.argmax(next_q_online, axis=1)
                next_q = qnet.apply({"params": target}, s2)
                next_q_sa = jnp.take_along_axis(next_q, next_a[:, None], axis=1)[:, 0]
                td_target = r + gamma * (1.0 - d) * jax.lax.stop_gradient(next_q_sa)
                td = jnp.mean((q_sa - td_target) ** 2)
                # conservative penalty
                cql = jnp.mean(jax.nn.logsumexp(q, axis=1) - q_sa)
                return td + alpha * cql

            loss, grads = jax.value_and_grad(loss_fn)((params, emb))
            updates, opt_state = tx.update(grads, opt_state)
            params, emb = optax.apply_updates((params, emb), updates)
            # keep the padding row at zero
            emb = emb.at[n_items].set(0.0)
            return params, emb, opt_state, loss

        n = len(hists)
        bsz = min(self.batch_size, n)
        step_no = 0
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                params, emb, opt_state, _ = step(
                    params, emb, target, emb_target, opt_state,
                    jnp.asarray(hists[rows]),
                    jnp.asarray(actions[rows]),
                    jnp.asarray(rewards[rows]),
                    jnp.asarray(next_hists[rows]),
                    jnp.asarray(dones[rows]),
                )
                step_no += 1
                if step_no % self.target_update_every == 0:
                    target, emb_target = params, emb
        self.params = params
        self.item_embeddings = np.asarray(emb[:n_items])

    def _get_save_state(self):
        if not hasattr(self, "params") or self.params is None:
            return {}
        return {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "item_embeddings": np.asarray(self.item_embeddings),
        }

    def _load_model(self, path: str):
        super()._load_model(path)
        if getattr(self, "params", None) is not None:
            self._qnet = _QNet(n_actions=len(self.fit_items))

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None:
            msg = "DiscreteCQL needs dataset interactions at predict time"
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
