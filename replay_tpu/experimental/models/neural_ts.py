"""NeuralTS: neural Thompson sampling (Zhang et al., arXiv 2010.00827).

TPU-native analog of the reference (reference:
replay/experimental/models/neural_ts.py, ~986 LoC torch Wide&Deep).
A Wide&Deep network maps (user, item, context features) to a feature
vector φ; the reward head is linear in φ, and exploration is Thompson
sampling on the head: w ~ N(ŵ, ν²A⁻¹) with A = λI + Σ φφᵀ the design
matrix over the training log.  Fitting is batched BCE on observed rewards;
the design matrix accumulates with one segment-free einsum.

Feature handling mirrors the reference's preprocessing (neural_ts.py:
MinMaxScaler + OneHotEncoder over wide/continuous/cat columns): numeric
query/item feature columns are min-max scaled, categorical ones one-hot
encoded, and both feed the wide linear term and the deep MLP alongside the
id embeddings.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender


class _WideDeep(nn.Module):
    n_users: int
    n_items: int
    embedding_dim: int = 32
    phi_dim: int = 32
    user_feat_dim: int = 0
    item_feat_dim: int = 0

    @nn.compact
    def __call__(self, users, items, user_feats=None, item_feats=None):
        init = nn.initializers.normal(stddev=0.05)
        u = nn.Embed(self.n_users, self.embedding_dim, embedding_init=init, name="user_emb")(users)
        v = nn.Embed(self.n_items, self.embedding_dim, embedding_init=init, name="item_emb")(items)
        wide = u * v
        deep_in = [u, v]
        wide_in = []
        if self.user_feat_dim:
            deep_in.append(user_feats)
            wide_in.append(user_feats)
        if self.item_feat_dim:
            deep_in.append(item_feats)
            wide_in.append(item_feats)
        if wide_in:
            # the reference's wide part is linear in the (one-hot/scaled)
            # feature columns; a Dense keeps φ's width fixed
            wide_lin = nn.Dense(self.embedding_dim, name="wide_lin")(
                jnp.concatenate(wide_in, axis=-1)
            )
            wide = wide + wide_lin
        deep = nn.relu(nn.Dense(64, name="fc1")(jnp.concatenate(deep_in, axis=-1)))
        deep = nn.relu(nn.Dense(self.phi_dim, name="fc2")(deep))
        phi = jnp.concatenate([wide, deep], axis=-1)
        return phi  # [B, embedding_dim + phi_dim]


def _encode_features(frame: Optional[pd.DataFrame], id_column: str, ids: np.ndarray):
    """Frame → dense [len(ids), F] matrix: numeric columns min-max scaled,
    categorical one-hot (reference preprocessing; rows for unknown ids are
    zero). Returns (matrix, fitted_spec) — spec re-applies at predict."""
    if frame is None or len(frame.columns) <= 1:
        return np.zeros((len(ids), 0), dtype=np.float32), None
    from pandas.api.types import is_numeric_dtype

    cols = [c for c in frame.columns if c != id_column]
    num_cols = [c for c in cols if is_numeric_dtype(frame[c])]
    cat_cols = [c for c in cols if c not in num_cols]
    spec = {"num": {}, "cat": {}, "id_column": id_column}
    parts = []
    indexed = frame.drop_duplicates(id_column).set_index(id_column)
    aligned = indexed.reindex(ids)
    for c in num_cols:
        vals = aligned[c].to_numpy(dtype=np.float64)
        lo, hi = np.nanmin(vals), np.nanmax(vals)
        spec["num"][c] = (float(lo), float(hi))
        scaled = (vals - lo) / (hi - lo) if hi > lo else np.zeros_like(vals)
        parts.append(np.nan_to_num(scaled)[:, None])
    for c in cat_cols:
        cats = sorted(indexed[c].dropna().unique().tolist())
        spec["cat"][c] = cats
        onehot = np.zeros((len(ids), len(cats)))
        col = aligned[c].to_numpy()
        for j, cat in enumerate(cats):
            onehot[:, j] = col == cat
        parts.append(onehot)
    mat = np.concatenate(parts, axis=1).astype(np.float32) if parts else np.zeros((len(ids), 0), np.float32)
    return mat, spec


class NeuralTS(Recommender):
    """Wide&Deep features + linear Thompson-sampling head."""

    def __init__(
        self,
        embedding_dim: int = 32,
        phi_dim: int = 32,
        nu: float = 1.0,
        lambda_reg: float = 1.0,
        learning_rate: float = 1e-3,
        epochs: int = 10,
        batch_size: int = 2048,
        use_features: bool = True,
        seed: Optional[int] = None,
    ):
        self.embedding_dim = embedding_dim
        self.phi_dim = phi_dim
        self.nu = nu
        self.lambda_reg = lambda_reg
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.batch_size = batch_size
        self.use_features = use_features
        self._seed = seed

    @property
    def _init_args(self):
        return {
            "embedding_dim": self.embedding_dim,
            "phi_dim": self.phi_dim,
            "nu": self.nu,
            "lambda_reg": self.lambda_reg,
            "learning_rate": self.learning_rate,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "use_features": self.use_features,
            "seed": self._seed,
        }

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        users = np.searchsorted(self.fit_queries, inter[self.query_column].to_numpy()).astype(np.int32)
        items = np.searchsorted(self.fit_items, inter[self.item_column].to_numpy()).astype(np.int32)
        rewards = (
            (inter[self.rating_column].to_numpy(dtype=np.float32) > 0).astype(np.float32)
            if self.rating_column in inter.columns
            else np.ones(len(inter), dtype=np.float32)
        )
        if self.use_features:
            self._user_feats, self._user_spec = _encode_features(
                dataset.query_features, self.query_column, self.fit_queries
            )
            self._item_feats, self._item_spec = _encode_features(
                dataset.item_features, self.item_column, self.fit_items
            )
        else:
            self._user_feats = np.zeros((len(self.fit_queries), 0), np.float32)
            self._item_feats = np.zeros((len(self.fit_items), 0), np.float32)
        fu, fi = self._user_feats.shape[1], self._item_feats.shape[1]
        net = _WideDeep(
            n_users=len(self.fit_queries),
            n_items=len(self.fit_items),
            embedding_dim=self.embedding_dim,
            phi_dim=self.phi_dim,
            user_feat_dim=fu,
            item_feat_dim=fi,
        )
        self._net = net
        uf_dev = jnp.asarray(self._user_feats)
        if_dev = jnp.asarray(self._item_feats)
        key = jax.random.PRNGKey(self._seed or 0)
        z = jnp.zeros(1, jnp.int32)
        params = net.init(key, z, z, uf_dev[:1], if_dev[:1])["params"]
        d = self.embedding_dim + self.phi_dim
        head = jnp.zeros(d)
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init((params, head))

        @jax.jit
        def step(params, head, opt_state, u, i, r):
            def loss_fn(state):
                p, w = state
                phi = net.apply({"params": p}, u, i, uf_dev[u], if_dev[i])
                logits = phi @ w
                return -jnp.mean(
                    r * jax.nn.log_sigmoid(logits) + (1 - r) * jax.nn.log_sigmoid(-logits)
                )

            loss, grads = jax.value_and_grad(loss_fn)((params, head))
            updates, opt_state = tx.update(grads, opt_state)
            params, head = optax.apply_updates((params, head), updates)
            return params, head, opt_state, loss

        rng = np.random.default_rng(self._seed)
        n = len(users)
        bsz = min(self.batch_size, n)
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                params, head, opt_state, _ = step(
                    params, head, opt_state,
                    jnp.asarray(users[rows]),
                    jnp.asarray(items[rows]),
                    jnp.asarray(rewards[rows]),
                )
        self.params = params
        self.head = np.asarray(head)

        # design matrix A = λI + Σ φφᵀ over the log (for posterior sampling)
        a = self.lambda_reg * np.eye(d, dtype=np.float64)
        apply = jax.jit(lambda u, i: net.apply({"params": params}, u, i, uf_dev[u], if_dev[i]))
        for start in range(0, n, 8192):
            phi = np.asarray(apply(jnp.asarray(users[start : start + 8192]),
                                   jnp.asarray(items[start : start + 8192])), dtype=np.float64)
            a += phi.T @ phi
        self._a_inv = np.linalg.inv(a)

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        rng = np.random.default_rng(self._seed)
        # Thompson sample of the head
        w = rng.multivariate_normal(self.head, self.nu**2 * self._a_inv).astype(np.float32)
        q_pos = np.searchsorted(self.fit_queries, query_ids).astype(np.int32)
        i_pos = np.searchsorted(self.fit_items, item_ids).astype(np.int32)
        b, m = len(q_pos), len(i_pos)
        u = jnp.repeat(jnp.asarray(q_pos)[:, None], m, axis=1).reshape(-1)
        v = jnp.tile(jnp.asarray(i_pos)[None, :], (b, 1)).reshape(-1)
        uf = jnp.asarray(self._user_feats)[u]
        vf = jnp.asarray(self._item_feats)[v]
        phi = self._net.apply({"params": self.params}, u, v, uf, vf)
        return np.asarray(phi @ jnp.asarray(w)).reshape(b, m)
