"""NeuroMF / NCF: neural matrix factorization (He et al., arXiv 1708.05031).

TPU-native analog of the reference (reference:
replay/experimental/models/neuromf.py — GMF :37, MLP :70, NMF :125,
NeuroMF :176).  GMF (elementwise product of embeddings) and an MLP tower
over concatenated embeddings feed a joint prediction head; training is
BCE on observed positives vs uniform sampled negatives, as fully-batched
jitted steps.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

_search_space = {
    "embedding_gmf_dim": {"type": "int", "args": [8, 256]},
    "embedding_mlp_dim": {"type": "int", "args": [8, 256]},
    "learning_rate": {"type": "loguniform", "args": [1e-4, 1e-2]},
}


class NMF(nn.Module):
    """GMF + MLP fusion network (reference: neuromf.py:125)."""

    user_count: int
    item_count: int
    embedding_gmf_dim: int = 128
    embedding_mlp_dim: int = 128
    hidden_mlp_dims: Sequence[int] = (128, 64)

    @nn.compact
    def __call__(self, users, items):
        init = nn.initializers.normal(stddev=0.01)
        parts = []
        if self.embedding_gmf_dim:
            u = nn.Embed(self.user_count, self.embedding_gmf_dim, embedding_init=init, name="gmf_user")(users)
            v = nn.Embed(self.item_count, self.embedding_gmf_dim, embedding_init=init, name="gmf_item")(items)
            parts.append(u * v)
        if self.embedding_mlp_dim:
            u = nn.Embed(self.user_count, self.embedding_mlp_dim, embedding_init=init, name="mlp_user")(users)
            v = nn.Embed(self.item_count, self.embedding_mlp_dim, embedding_init=init, name="mlp_item")(items)
            h = jnp.concatenate([u, v], axis=-1)
            for j, dim in enumerate(self.hidden_mlp_dims):
                h = nn.relu(nn.Dense(dim, name=f"mlp_{j}")(h))
            parts.append(h)
        joint = jnp.concatenate(parts, axis=-1)
        return nn.Dense(1, name="head")(joint)[..., 0]


class NeuroMF(Recommender):
    """Neural collaborative filtering with BCE + sampled negatives."""

    _search_space = _search_space

    def __init__(
        self,
        embedding_gmf_dim: int = 128,
        embedding_mlp_dim: int = 128,
        hidden_mlp_dims: Optional[Sequence[int]] = None,
        learning_rate: float = 1e-3,
        epochs: int = 20,
        n_negatives: int = 4,
        batch_size: int = 8192,
        seed: Optional[int] = None,
    ):
        if not embedding_gmf_dim and not embedding_mlp_dim:
            msg = "At least one of embedding_gmf_dim, embedding_mlp_dim must be set"
            raise ValueError(msg)
        self.embedding_gmf_dim = embedding_gmf_dim
        self.embedding_mlp_dim = embedding_mlp_dim
        self.hidden_mlp_dims = tuple(hidden_mlp_dims or (128, 64))
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.n_negatives = n_negatives
        self.batch_size = batch_size
        self._seed = seed
        self.params = None

    @property
    def _init_args(self):
        return {
            "embedding_gmf_dim": self.embedding_gmf_dim,
            "embedding_mlp_dim": self.embedding_mlp_dim,
            "hidden_mlp_dims": list(self.hidden_mlp_dims),
            "learning_rate": self.learning_rate,
            "epochs": self.epochs,
            "n_negatives": self.n_negatives,
            "batch_size": self.batch_size,
            "seed": self._seed,
        }

    def _get_save_state(self):
        if self.params is None:
            return {}
        return {"params": jax.tree_util.tree_map(np.asarray, self.params)}

    def _load_model(self, path: str):
        super()._load_model(path)
        if getattr(self, "params", None) is not None:
            self._model = NMF(
                user_count=len(self.fit_queries),
                item_count=len(self.fit_items),
                embedding_gmf_dim=self.embedding_gmf_dim,
                embedding_mlp_dim=self.embedding_mlp_dim,
                hidden_mlp_dims=self.hidden_mlp_dims,
            )

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        users = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy()).astype(np.int32)
        items = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy()).astype(np.int32)
        n_users, n_items = len(self.fit_queries), len(self.fit_items)

        model = NMF(
            user_count=n_users,
            item_count=n_items,
            embedding_gmf_dim=self.embedding_gmf_dim,
            embedding_mlp_dim=self.embedding_mlp_dim,
            hidden_mlp_dims=self.hidden_mlp_dims,
        )
        self._model = model
        key = jax.random.PRNGKey(self._seed or 0)
        params = model.init(key, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))["params"]
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init(params)
        n_neg = self.n_negatives

        @jax.jit
        def step(params, opt_state, u, i, key):
            negs = jax.random.randint(key, (len(u), n_neg), 0, n_items)

            def loss_fn(p):
                pos = model.apply({"params": p}, u, i)
                u_rep = jnp.repeat(u[:, None], n_neg, axis=1).reshape(-1)
                neg = model.apply({"params": p}, u_rep, negs.reshape(-1))
                return -(
                    jnp.mean(jax.nn.log_sigmoid(pos))
                    + jnp.mean(jax.nn.log_sigmoid(-neg))
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(self._seed)
        n = len(users)
        bsz = min(self.batch_size, n)
        step_no = 0
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                params, opt_state, _ = step(
                    params,
                    opt_state,
                    jnp.asarray(users[rows]),
                    jnp.asarray(items[rows]),
                    jax.random.fold_in(key, step_no),
                )
                step_no += 1
        self.params = params

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        q_pos = np.searchsorted(self.fit_queries, query_ids).astype(np.int32)
        i_pos = np.searchsorted(self.fit_items, item_ids).astype(np.int32)
        b, m = len(q_pos), len(i_pos)
        u = jnp.repeat(jnp.asarray(q_pos)[:, None], m, axis=1).reshape(-1)
        v = jnp.tile(jnp.asarray(i_pos)[None, :], (b, 1)).reshape(-1)
        scores = self._model.apply({"params": self.params}, u, v)
        return np.asarray(scores).reshape(b, m)
