"""NeuroMF / NCF: neural matrix factorization (He et al., arXiv 1708.05031).

TPU-native analog of the reference (reference:
replay/experimental/models/neuromf.py — GMF :37, MLP :70, NMF :125,
NeuroMF :176).  GMF (elementwise product of embeddings, plus user/item bias
embeddings) and an MLP tower over concatenated embeddings feed a joint
prediction head; training is BCE on observed positives vs uniform sampled
negatives as fully-batched jitted steps, with the reference's train/valid
split and ReduceLROnPlateau schedule (factor/patience on validation loss).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender

EMBED_DIM = 128

_search_space = {
    "embedding_gmf_dim": {"type": "int", "args": [EMBED_DIM, EMBED_DIM]},
    "embedding_mlp_dim": {"type": "int", "args": [EMBED_DIM, EMBED_DIM]},
    "learning_rate": {"type": "loguniform", "args": [0.0001, 0.5]},
    "l2_reg": {"type": "loguniform", "args": [1e-9, 5]},
    "count_negative_sample": {"type": "int", "args": [1, 20]},
}

_xavier = nn.initializers.xavier_normal()
_zeros = nn.initializers.zeros
_bias_init = nn.initializers.normal(stddev=0.001)


class NMF(nn.Module):
    """GMF + MLP fusion network (reference: neuromf.py:125).

    Both towers carry user/item BIAS embeddings added to the main embedding
    (reference GMF.forward :57-67, MLP.forward :110-122); weights use Xavier
    normal init and biases start at zero (reference xavier_init_ :24).
    The head ends in a sigmoid so scores are probabilities (:171).
    """

    user_count: int
    item_count: int
    embedding_gmf_dim: int = EMBED_DIM
    embedding_mlp_dim: int = EMBED_DIM
    hidden_mlp_dims: Sequence[int] = ()

    def _tower_embeds(self, name, dim, users, items):
        u = nn.Embed(self.user_count, dim, embedding_init=_xavier, name=f"{name}_user")(users)
        v = nn.Embed(self.item_count, dim, embedding_init=_xavier, name=f"{name}_item")(items)
        ub = nn.Embed(self.user_count, 1, embedding_init=_zeros, name=f"{name}_user_bias")(users)
        vb = nn.Embed(self.item_count, 1, embedding_init=_zeros, name=f"{name}_item_bias")(items)
        return u + ub, v + vb

    @nn.compact
    def __call__(self, users, items, return_logit: bool = False):
        parts = []
        if self.embedding_gmf_dim:
            u, v = self._tower_embeds("gmf", self.embedding_gmf_dim, users, items)
            parts.append(u * v)
        if self.embedding_mlp_dim:
            u, v = self._tower_embeds("mlp", self.embedding_mlp_dim, users, items)
            h = jnp.concatenate([u, v], axis=-1)
            for j, dim in enumerate(self.hidden_mlp_dims):
                h = nn.relu(
                    nn.Dense(dim, kernel_init=_xavier, bias_init=_bias_init, name=f"mlp_{j}")(h)
                )
            parts.append(h)
        joint = jnp.concatenate(parts, axis=-1)
        logit = nn.Dense(1, kernel_init=_xavier, bias_init=_bias_init, name="head")(joint)[..., 0]
        # training computes BCE in logit space (gradient-identical to the
        # reference's binary_cross_entropy on the sigmoid, numerically safer)
        return logit if return_logit else jax.nn.sigmoid(logit)


class NeuroMF(Recommender):
    """Neural collaborative filtering with BCE + sampled negatives.

    Mirrors the reference trainer loop (reference: neuromf.py:277-337):
    a ``valid_split_size`` holdout drives a ReduceLROnPlateau schedule
    (``factor``/``patience``), Adam carries ``l2_reg / batch_size`` weight
    decay, and each step's loss is BCE averaged over the CONCATENATED
    positive+negative predictions (so positives weigh 1/(1+n_neg)).
    """

    _search_space = _search_space

    valid_split_size: float = 0.1
    split_seed: int = 42

    def __init__(
        self,
        learning_rate: float = 0.05,
        epochs: int = 20,
        embedding_gmf_dim: Optional[int] = None,
        embedding_mlp_dim: Optional[int] = None,
        hidden_mlp_dims: Optional[Sequence[int]] = None,
        l2_reg: float = 0.0,
        count_negative_sample: Optional[int] = None,
        factor: float = 0.2,
        patience: int = 3,
        batch_size: int = 100000,
        seed: Optional[int] = None,
        n_negatives: Optional[int] = None,
    ):
        # both-unset → the reference's default full NMF (EMBED_DIM towers)
        if not embedding_gmf_dim and not embedding_mlp_dim:
            embedding_gmf_dim, embedding_mlp_dim = EMBED_DIM, EMBED_DIM
        if (embedding_gmf_dim is None or embedding_gmf_dim < 0) and (
            embedding_mlp_dim is None or embedding_mlp_dim < 0
        ):
            msg = "embedding_gmf_dim and embedding_mlp_dim must be positive"
            raise ValueError(msg)
        self.embedding_gmf_dim = embedding_gmf_dim or 0
        self.embedding_mlp_dim = embedding_mlp_dim or 0
        self.hidden_mlp_dims = tuple(hidden_mlp_dims or ())
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.l2_reg = l2_reg
        # n_negatives kept as a back-compat alias for count_negative_sample
        if count_negative_sample is None:
            count_negative_sample = n_negatives if n_negatives is not None else 1
        self.count_negative_sample = int(count_negative_sample)
        self.factor = factor
        self.patience = patience
        self.batch_size = batch_size
        self._seed = seed
        self.params = None

    @property
    def n_negatives(self) -> int:
        return self.count_negative_sample

    @property
    def _init_args(self):
        return {
            "learning_rate": self.learning_rate,
            "epochs": self.epochs,
            "embedding_gmf_dim": self.embedding_gmf_dim,
            "embedding_mlp_dim": self.embedding_mlp_dim,
            "hidden_mlp_dims": list(self.hidden_mlp_dims),
            "l2_reg": self.l2_reg,
            "count_negative_sample": self.count_negative_sample,
            "factor": self.factor,
            "patience": self.patience,
            "batch_size": self.batch_size,
            "seed": self._seed,
        }

    def _get_save_state(self):
        if self.params is None:
            return {}
        return {"params": jax.tree_util.tree_map(np.asarray, self.params)}

    def _make_model(self) -> NMF:
        return NMF(
            user_count=len(self.fit_queries),
            item_count=len(self.fit_items),
            embedding_gmf_dim=self.embedding_gmf_dim,
            embedding_mlp_dim=self.embedding_mlp_dim,
            hidden_mlp_dims=self.hidden_mlp_dims,
        )

    def _load_model(self, path: str):
        super()._load_model(path)
        if getattr(self, "params", None) is not None:
            self._model = self._make_model()

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        users = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy()).astype(np.int32)
        items = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy()).astype(np.int32)
        n_items = len(self.fit_items)

        # train/valid split (reference: train_test_split(test_size=0.1, seed=42))
        n = len(users)
        split_rng = np.random.default_rng(self.split_seed)
        perm = split_rng.permutation(n)
        n_valid = max(1, int(round(n * self.valid_split_size))) if n > 1 else 0
        valid_rows, train_rows = perm[:n_valid], perm[n_valid:]
        if len(train_rows) == 0:
            train_rows, valid_rows = perm, perm[:0]

        model = self._make_model()
        self._model = model
        key = jax.random.PRNGKey(self._seed or 0)
        params = model.init(key, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))["params"]
        bsz = min(self.batch_size, len(train_rows))

        from replay_tpu.experimental.models._optim import adam_l2

        tx = adam_l2(self.learning_rate, self.l2_reg / self.batch_size)
        opt_state = tx.init(params)
        n_neg = self.count_negative_sample

        def loss_fn(p, u, i, negs):
            pos = model.apply({"params": p}, u, i, return_logit=True)
            u_rep = jnp.repeat(u[:, None], n_neg, axis=1).reshape(-1)
            neg = model.apply({"params": p}, u_rep, negs.reshape(-1), return_logit=True)
            # BCE over the concatenation, like the reference's
            # binary_cross_entropy(cat(pos, neg), cat(1, 0)) — computed from
            # logits (same gradient d/dlogit = sigmoid(logit) − y)
            pos_term = jnp.sum(-jax.nn.log_sigmoid(pos))
            neg_term = jnp.sum(-jax.nn.log_sigmoid(-neg))
            return (pos_term + neg_term) / (pos.size + neg.size)

        @jax.jit
        def step(params, opt_state, u, i, key):
            negs = jax.random.randint(key, (len(u), n_neg), 0, n_items)
            loss, grads = jax.value_and_grad(loss_fn)(params, u, i, negs)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def valid_loss(params, u, i, key):
            negs = jax.random.randint(key, (len(u), n_neg), 0, n_items)
            return loss_fn(params, u, i, negs)

        rng = np.random.default_rng(self._seed)
        step_no = 0
        best_valid = np.inf
        epochs_since_best = 0
        lr = self.learning_rate
        for _epoch in range(self.epochs):
            order = rng.permutation(len(train_rows))
            for start in range(0, len(order), bsz):
                rows = train_rows[order[start : start + bsz]]
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
            # ReduceLROnPlateau on the validation loss (reference :307)
            if len(valid_rows):
                v = float(
                    valid_loss(
                        params,
                        jnp.asarray(users[valid_rows]),
                        jnp.asarray(items[valid_rows]),
                        jax.random.fold_in(key, 10_000_000 + _epoch),
                    )
                )
                if v < best_valid - 1e-12:
                    best_valid = v
                    epochs_since_best = 0
                else:
                    epochs_since_best += 1
                    if epochs_since_best > self.patience:
                        lr *= self.factor
                        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
                        epochs_since_best = 0
        self.params = params

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        q_pos = np.searchsorted(self.fit_queries, query_ids).astype(np.int32)
        i_pos = np.searchsorted(self.fit_items, item_ids).astype(np.int32)
        b, m = len(q_pos), len(i_pos)
        u = jnp.repeat(jnp.asarray(q_pos)[:, None], m, axis=1).reshape(-1)
        v = jnp.tile(jnp.asarray(i_pos)[None, :], (b, 1)).reshape(-1)
        scores = self._model.apply({"params": self.params}, u, v)
        return np.asarray(scores).reshape(b, m)
