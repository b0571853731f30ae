"""MultVAE: variational autoencoder for collaborative filtering
(Liang et al., arXiv 1802.05814).

TPU-native analog of the reference (reference:
replay/experimental/models/mult_vae.py:109 MultVAE, VAE module :20).
The torch per-user loop becomes fully-batched jitted steps over dense user
interaction rows: encoder [n_items→hidden→2·latent], reparameterized
sample, decoder back to item logits; multinomial log-likelihood + annealed
KL.  Prediction scores are the decoder outputs at the posterior mean.
"""

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.sparse import csr_matrix

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

_search_space = {
    "learning_rate": {"type": "loguniform", "args": [1e-4, 1e-2]},
    "epochs": {"type": "int", "args": [50, 150]},
    "latent_dim": {"type": "int", "args": [64, 400]},
    "hidden_dim": {"type": "int", "args": [300, 800]},
}


class VAE(nn.Module):
    """Encoder/decoder pair (reference: mult_vae.py:20)."""

    item_count: int
    latent_dim: int
    hidden_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, key=None, deterministic: bool = True):
        h = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = jnp.tanh(nn.Dense(self.hidden_dim, name="enc1")(h))
        stats = nn.Dense(self.latent_dim * 2, name="enc2")(h)
        mu, logvar = jnp.split(stats, 2, axis=-1)
        if deterministic or key is None:
            z = mu
        else:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        h = jnp.tanh(nn.Dense(self.hidden_dim, name="dec1")(z))
        logits = nn.Dense(self.item_count, name="dec2")(h)
        return logits, mu, logvar


class MultVAE(Recommender):
    """Multinomial VAE over user interaction vectors."""

    _search_space = _search_space

    def __init__(
        self,
        learning_rate: float = 0.01,
        epochs: int = 100,
        latent_dim: int = 200,
        hidden_dim: int = 600,
        dropout: float = 0.3,
        anneal: float = 0.1,
        l2_reg: float = 0.0,
        factor: float = 0.2,
        patience: int = 3,
        batch_size: int = 256,
        seed: Optional[int] = None,
    ):
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.latent_dim = latent_dim
        self.hidden_dim = hidden_dim
        self.dropout = dropout
        self.anneal = anneal
        self.l2_reg = l2_reg
        self.factor = factor
        self.patience = patience
        self.batch_size = batch_size
        self._seed = seed
        self.params = None

    @property
    def _init_args(self):
        return {
            "learning_rate": self.learning_rate,
            "epochs": self.epochs,
            "latent_dim": self.latent_dim,
            "hidden_dim": self.hidden_dim,
            "dropout": self.dropout,
            "anneal": self.anneal,
            "l2_reg": self.l2_reg,
            "factor": self.factor,
            "patience": self.patience,
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
            self._model = VAE(
                item_count=len(self.fit_items),
                latent_dim=self.latent_dim,
                hidden_dim=self.hidden_dim,
                dropout=self.dropout,
            )

    def _user_matrix(self, dataset: Dataset) -> csr_matrix:
        inter = dataset.interactions
        q = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy())
        i = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy())
        return csr_matrix(
            (np.ones(len(inter), dtype=np.float32), (q, i)),
            shape=(len(self.fit_queries), len(self.fit_items)),
        )

    def _fit(self, dataset: Dataset) -> None:
        mat = self._user_matrix(dataset)
        n_items = len(self.fit_items)
        model = VAE(
            item_count=n_items,
            latent_dim=self.latent_dim,
            hidden_dim=self.hidden_dim,
            dropout=self.dropout,
        )
        self._model = model
        key = jax.random.PRNGKey(self._seed or 0)
        params = model.init(
            {"params": key, "dropout": key}, jnp.zeros((1, n_items)), deterministic=True
        )["params"]
        # lr halts on plateau like the reference's ReduceLROnPlateau
        # (mult_vae.py factor/patience params); inject_hyperparams lets the
        # epoch loop rescale the lr without recompiling the step
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate)
        opt_state = tx.init(params)
        anneal = jnp.float32(self.anneal)
        l2 = self.l2_reg

        @jax.jit
        def step(params, opt_state, x, key):
            dkey, skey = jax.random.split(key)

            def loss_fn(p):
                logits, mu, logvar = model.apply(
                    {"params": p}, x, key=skey, deterministic=False, rngs={"dropout": dkey}
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.sum(logp * x, axis=-1)
                kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
                loss = jnp.mean(nll + anneal * kld)
                if l2 > 0:
                    loss = loss + l2 * sum(
                        jnp.sum(w**2) for w in jax.tree_util.tree_leaves(p)
                    )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        n_q = mat.shape[0]
        rng = np.random.default_rng(self._seed)
        bsz = min(self.batch_size, n_q)
        step_no = 0
        lr_now, best, bad = self.learning_rate, np.inf, 0
        for epoch in range(self.epochs):
            order = rng.permutation(n_q)
            epoch_losses = []
            for start in range(0, n_q, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                x = jnp.asarray(mat[rows].toarray())
                params, opt_state, loss = step(
                    params, opt_state, x, jax.random.fold_in(key, step_no)
                )
                epoch_losses.append(float(loss))
                step_no += 1
            mean_loss = float(np.mean(epoch_losses))
            if mean_loss < best - 1e-5:
                best, bad = mean_loss, 0
            else:
                bad += 1
                if bad > self.patience:
                    lr_now *= self.factor
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(
                        lr_now, dtype=jnp.float32
                    )
                    bad = 0
        self.params = params

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None:
            msg = "MultVAE needs dataset interactions at predict time"
            raise ValueError(msg)
        inter = dataset.interactions
        sub = inter[inter[self.query_column].isin(query_ids)]
        known = np.isin(sub[self.item_column].to_numpy(), self.fit_items)
        sub = sub[known]
        q_pos = np.searchsorted(query_ids, sub[self.query_column].to_numpy())
        i_pos = np.searchsorted(self.fit_items, sub[self.item_column].to_numpy())
        x = np.zeros((len(query_ids), len(self.fit_items)), dtype=np.float32)
        x[q_pos, i_pos] = 1.0
        logits, _, _ = self._model.apply(
            {"params": self.params}, jnp.asarray(x), deterministic=True
        )
        item_pos = np.searchsorted(self.fit_items, item_ids)
        return np.asarray(logits)[:, item_pos]
