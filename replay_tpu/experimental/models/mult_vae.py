"""MultVAE: variational autoencoder for collaborative filtering
(Liang et al., arXiv 1802.05814).

TPU-native analog of the reference (reference:
replay/experimental/models/mult_vae.py:109 MultVAE, VAE module :20).
The torch per-user loop becomes fully-batched jitted steps over dense user
interaction rows: encoder [n_items→hidden→2·latent], reparameterized
sample, decoder back to item logits; multinomial log-likelihood + annealed
KL.  Training mirrors the reference loop: a user-grouped validation split
(GroupShuffleSplit analog) whose loss drives a ReduceLROnPlateau schedule,
and torch-Adam-style L2 (`l2_reg / batch_size` added to the gradient).
Prediction scores are the decoder outputs at the posterior mean.
"""

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
    "learning_rate": {"type": "loguniform", "args": [0.0001, 0.5]},
    "epochs": {"type": "int", "args": [100, 100]},
    "latent_dim": {"type": "int", "args": [200, 200]},
    "hidden_dim": {"type": "int", "args": [600, 600]},
    "dropout": {"type": "uniform", "args": [0, 0.5]},
    "anneal": {"type": "uniform", "args": [0.2, 1]},
    "l2_reg": {"type": "loguniform", "args": [1e-9, 5]},
}

_xavier = nn.initializers.xavier_normal()
_bias_init = nn.initializers.normal(stddev=0.001)


def _dense(dim, name):
    return nn.Dense(dim, kernel_init=_xavier, bias_init=_bias_init, name=name)


class VAE(nn.Module):
    """Encoder/decoder pair (reference: mult_vae.py:20).

    L2-normalized input → dropout → ReLU encoder → (mu, logvar) → ReLU
    decoder, with Xavier-normal weights and N(0, 0.001) biases
    (reference weight_init :97-106).
    """

    item_count: int
    latent_dim: int
    hidden_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, key=None, deterministic: bool = True):
        h = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.relu(_dense(self.hidden_dim, "enc1")(h))
        stats = _dense(self.latent_dim * 2, "enc2")(h)
        mu, logvar = jnp.split(stats, 2, axis=-1)
        if deterministic or key is None:
            z = mu
        else:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        h = nn.relu(_dense(self.hidden_dim, "dec1")(z))
        logits = _dense(self.item_count, "dec2")(h)
        return logits, mu, logvar


class MultVAE(Recommender):
    """Multinomial VAE over user interaction vectors."""

    _search_space = _search_space
    can_predict_cold_queries = True  # scores come from the history vector
    valid_split_size: float = 0.1
    split_seed: int = 42

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
        batch_size: int = 5000,
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
        n_q = mat.shape[0]

        # user-grouped holdout (reference: GroupShuffleSplit(test_size=0.1,
        # random_state=42) on user_idx, mult_vae.py:212-214) — validation
        # users are disjoint from training users
        split_rng = np.random.default_rng(self.split_seed)
        user_perm = split_rng.permutation(n_q)
        n_valid = int(round(n_q * self.valid_split_size)) if n_q > 1 else 0
        valid_users, train_users = user_perm[:n_valid], user_perm[n_valid:]

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
        bsz = min(self.batch_size, max(1, len(train_users)))

        # torch Adam(weight_decay=l2/batch): L2 added to the gradient before
        # the moment update; lr rescaled on validation plateau like the
        # reference's ReduceLROnPlateau (inject_hyperparams avoids recompiles)
        from replay_tpu.experimental.models._optim import adam_l2

        tx = adam_l2(self.learning_rate, self.l2_reg / self.batch_size)
        opt_state = tx.init(params)
        anneal = jnp.float32(self.anneal)

        def loss_fn(p, x, skey, dkey, deterministic):
            logits, mu, logvar = model.apply(
                {"params": p},
                x,
                key=skey,
                deterministic=deterministic,
                rngs={"dropout": dkey},
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.sum(logp * x, axis=-1)
            kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
            return jnp.mean(nll + anneal * kld)

        @jax.jit
        def step(params, opt_state, x, key):
            dkey, skey = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, x, skey, dkey, False)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_loss(params, x, key):
            dkey, skey = jax.random.split(key)
            return loss_fn(params, x, skey, dkey, True)

        rng = np.random.default_rng(self._seed)
        step_no = 0
        lr_now, best, bad = self.learning_rate, np.inf, 0
        for epoch in range(self.epochs):
            order = rng.permutation(len(train_users))
            for start in range(0, len(order), bsz):
                rows = train_users[order[start : start + bsz]]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                x = jnp.asarray(mat[rows].toarray())
                params, opt_state, loss = step(
                    params, opt_state, x, jax.random.fold_in(key, step_no)
                )
                step_no += 1
            # plateau schedule driven by the held-out users' loss
            # (falls back to a training batch when the log is too small)
            eval_rows = valid_users if len(valid_users) else train_users[:bsz]
            v = float(
                eval_loss(
                    params,
                    jnp.asarray(mat[eval_rows].toarray()),
                    jax.random.fold_in(key, 10_000_000 + epoch),
                )
            )
            if v < best - 1e-5:
                best, bad = v, 0
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
