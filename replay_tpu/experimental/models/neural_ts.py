"""NeuralTS: neural Thompson sampling over a Wide&Deep model.

TPU-native analog of the reference (reference:
replay/experimental/models/neural_ts.py, ~986 LoC torch).  Capability
parity with the reference pipeline:

- **Wide&Deep** (arXiv 1606.07792; reference ``Wide``/``Deep``/
  ``EmbedModel``/``WideDeep``): id embeddings plus *crossed* embeddings
  whose dot product feeds the wide part; wide = linear+norm over
  [wide features, crossed embeddings, crossed dot]; deep = MLP with
  configurable ``hidden_layers`` over [cat one-hots, scaled continuous,
  id embeddings]; head = Dense+ReLU; score = Dense(1) after head dropout.
  (BatchNorm1d → LayerNorm: the static-shape equivalent that needs no
  running statistics or cross-replica batch sync on a TPU mesh.)
- **Feature plumbing** (reference ``preprocess_features_fit``):
  MinMax-scaled continuous columns, one-hot categoricals, with optional
  ``user_cols``/``item_cols`` dicts ({"continuous_cols", "cat_embed_cols",
  "wide_cols"}) selecting the reference's column routing; the default
  auto-routes numeric → continuous and categorical → cat + wide.
- **Negative sampling** (reference ``UserDatasetWithReset``): per epoch,
  every user's positives are joined by ``cnt_neg_samples`` fresh unseen
  items (plus any observed zero-reward rows); resampled each epoch — the
  reference's ``SamplerWithReset.reset()``.
- **Losses** (reference ``warp_loss``/``w_log_loss``): WARP — per
  positive, scan permuted negatives until one violates the margin, weight
  the hinge by log((N−1)/tries) — vectorized to a static-shape
  first-violation gather; or class-weighted logistic loss.
- **Exploration**: ``"dropout"`` (reference ``predict_test``):
  ``cnt_samples_for_predict`` MC-dropout passes through the head; score =
  mean + ``exploration_coef``·std.  ``"linear"``: Thompson sampling on a
  linear head with posterior N(ŵ, ν²A⁻¹), A the design matrix of head
  features over the log (the NeuralTS-paper mechanism, kept from round 1).
- **Trainer**: AdamW + cosine annealing to ``lr_min`` (reference
  ``CosineAnnealingLR``), one jitted step; optional per-epoch validation
  precision@k on an internal time split (reference
  ``predict_val_with_ndcg``), recorded in ``val_history``.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender


# --------------------------------------------------------------- features


def _auto_cols(frame: pd.DataFrame, id_column: str):
    from pandas.api.types import is_numeric_dtype

    cols = [c for c in frame.columns if c != id_column]
    num = [c for c in cols if is_numeric_dtype(frame[c])]
    cat = [c for c in cols if c not in num]
    return {"continuous_cols": num, "cat_embed_cols": cat, "wide_cols": cat}


def _encode_features(
    frame: Optional[pd.DataFrame],
    id_column: str,
    ids: np.ndarray,
    col_spec: Optional[dict] = None,
):
    """Frame → (combined [len(ids), F], blocks dict, spec).

    Blocks mirror the reference routing (neural_ts.py
    ``preprocess_features_fit``): ``continuous`` = MinMax-scaled numerics,
    ``cat`` = one-hot of cat_embed_cols, ``wide`` = one-hot of wide_cols
    (+ raw numerics listed in wide_cols).  Unknown ids get zero rows.
    """
    empty = np.zeros((len(ids), 0), dtype=np.float32)
    if frame is None or len(frame.columns) <= 1:
        return empty, {"wide": empty, "continuous": empty, "cat": empty}, None

    spec = col_spec or _auto_cols(frame, id_column)
    indexed = frame.drop_duplicates(id_column).set_index(id_column)
    aligned = indexed.reindex(ids)

    def scaled(col):
        vals = aligned[col].to_numpy(dtype=np.float64)
        lo, hi = np.nanmin(indexed[col].to_numpy(dtype=np.float64)), np.nanmax(
            indexed[col].to_numpy(dtype=np.float64)
        )
        out = (vals - lo) / (hi - lo) if hi > lo else np.zeros_like(vals)
        return np.nan_to_num(out)[:, None].astype(np.float32), (float(lo), float(hi))

    def onehot(col):
        cats = sorted(indexed[col].dropna().unique().tolist())
        mat = np.zeros((len(ids), len(cats)), dtype=np.float32)
        vals = aligned[col].to_numpy()
        for j, cat in enumerate(cats):
            mat[:, j] = vals == cat
        return mat, cats

    fitted = {"num": {}, "cat": {}, "spec": spec, "id_column": id_column}
    blocks = {}
    for name, cols in (
        ("continuous", spec.get("continuous_cols", [])),
        ("cat", spec.get("cat_embed_cols", [])),
        ("wide", spec.get("wide_cols", [])),
    ):
        parts = []
        for c in cols:
            if c in fitted["num"] or (
                c not in fitted["cat"] and pd.api.types.is_numeric_dtype(indexed[c])
            ):
                mat, rng = scaled(c)
                fitted["num"][c] = rng
            else:
                mat, cats = onehot(c)
                fitted["cat"][c] = cats
            parts.append(mat)
        blocks[name] = (
            np.concatenate(parts, axis=1) if parts else empty
        )
    combined = np.concatenate(
        [blocks["continuous"], blocks["cat"]], axis=1
    ) if (blocks["continuous"].shape[1] or blocks["cat"].shape[1]) else empty
    return combined, blocks, fitted


# ------------------------------------------------------------------ model


class _WideDeep(nn.Module):
    """Reference WideDeep (neural_ts.py:306) in flax."""

    n_users: int
    n_items: int
    user_embed: int
    item_embed: int
    crossed_embed: int
    hidden_layers: Sequence[int]
    wide_out_dim: int
    deep_out_dim: int
    dim_head: int
    deep_dropout: float
    head_dropout: float = 0.0

    def setup(self):
        init = nn.initializers.normal(stddev=0.05)
        self.user_emb = nn.Embed(self.n_users, self.user_embed, embedding_init=init)
        self.item_emb = nn.Embed(self.n_items, self.item_embed, embedding_init=init)
        self.user_cross = nn.Embed(self.n_users, self.crossed_embed, embedding_init=init)
        self.item_cross = nn.Embed(self.n_items, self.crossed_embed, embedding_init=init)
        self.wide_lin = nn.Dense(self.wide_out_dim)
        self.wide_ln = nn.LayerNorm()
        self.deep_lins = [nn.Dense(s) for s in self.hidden_layers]
        self.deep_lns = [nn.LayerNorm() for _ in self.hidden_layers]
        self.deep_out = nn.Dense(self.deep_out_dim)
        self.deep_out_ln = nn.LayerNorm()
        self.head = nn.Dense(self.dim_head)
        self.last_lin = nn.Dense(1)
        self.deep_drop = nn.Dropout(self.deep_dropout)
        self.head_drop = nn.Dropout(self.head_dropout)

    def phi(self, users, items, wide_feats, cont_feats, cat_feats,
            deterministic: bool = True):
        """Head features before the final dropout+Dense — reference
        ``forward_for_predict``."""
        u = self.user_emb(users)
        v = self.item_emb(items)
        cu = self.user_cross(users)
        ci = self.item_cross(items)
        cross = jnp.sum(cu * ci, axis=-1, keepdims=True)

        wide_in = jnp.concatenate([wide_feats, cu, ci, cross], axis=-1)
        wide = nn.relu(self.wide_lin(wide_in))
        if self.wide_out_dim > 1:
            # LayerNorm over a single feature would collapse it to the bias
            # (the reference's BatchNorm1d normalizes across the batch)
            wide = self.wide_ln(wide)

        deep = jnp.concatenate([cat_feats, cont_feats, u, v], axis=-1)
        for lin, ln in zip(self.deep_lins, self.deep_lns):
            deep = self.deep_drop(ln(nn.relu(lin(deep))), deterministic=deterministic)
        deep = self.deep_drop(
            self.deep_out_ln(nn.relu(self.deep_out(deep))), deterministic=deterministic
        )

        head_in = jnp.concatenate([wide, deep], axis=-1)
        return nn.relu(self.head(head_in))

    def last(self, phi):
        return self.last_lin(phi)[..., 0]

    def __call__(self, users, items, wide_feats, cont_feats, cat_feats,
                 deterministic: bool = True):
        p = self.phi(users, items, wide_feats, cont_feats, cat_feats,
                     deterministic=deterministic)
        p = self.head_drop(p, deterministic=deterministic)
        return self.last(p)


# ------------------------------------------------------------------ losses


def _warp_loss(pos_pred, neg_pred, num_labels, valid):
    """Reference warp_loss (neural_ts.py:65) with static shapes.

    :param pos_pred: [P]; :param neg_pred: [P, T] permuted negative
        scores; :param valid: [P] 1 where the row has real negatives.
    """
    t = neg_pred.shape[1]
    margin = 1.0 + neg_pred - pos_pred[:, None]  # [P, T]
    violated = margin > 0
    any_hit = jnp.any(violated, axis=1)
    first = jnp.argmax(violated, axis=1)  # first violating trial
    tries = first + 1
    weight = jnp.log(jnp.maximum(jnp.floor((num_labels - 1) / tries), 1.0))
    neg_at = jnp.take_along_axis(neg_pred, first[:, None], axis=1)[:, 0]
    loss = weight * (1.0 - pos_pred + neg_at)
    keep = any_hit & (tries <= t) & (valid > 0)
    return jnp.sum(jnp.where(keep, loss, 0.0))


def _w_log_loss(pred, label):
    """Reference w_log_loss (neural_ts.py:47): class-balanced BCE."""
    p = jnp.clip(jax.nn.sigmoid(pred), 1e-7, 1 - 1e-7)
    count1 = jnp.sum(label)
    count0 = label.shape[0] - count1
    mx = jnp.maximum(count0, count1)
    w1 = jnp.where((count1 > 0) & (count0 > 0), mx / jnp.maximum(count1, 1), 1.0)
    w0 = jnp.where((count1 > 0) & (count0 > 0), mx / jnp.maximum(count0, 1), 1.0)
    ll = w1 * label * jnp.log(p) + w0 * (1 - label) * jnp.log(1 - p)
    return -jnp.mean(ll)


class NeuralTS(Recommender):
    """Wide&Deep + Thompson-sampling exploration (dropout or linear)."""

    def __init__(
        self,
        embedding_sizes: Sequence[int] = (32, 32, 64),
        hidden_layers: Sequence[int] = (32, 20),
        wide_out_dim: int = 1,
        deep_out_dim: int = 20,
        head_dropout: float = 0.8,
        deep_dropout: float = 0.4,
        dim_head: int = 20,
        epochs: int = 2,
        learning_rate: float = 3e-4,
        lr_min: float = 1e-5,
        loss: str = "warp",  # "warp" | "logistic"
        cnt_neg_samples: int = 100,
        cnt_samples_for_predict: int = 10,
        exploration_coef: float = 1.0,
        exploration: str = "dropout",  # "dropout" | "linear"
        nu: float = 1.0,
        lambda_reg: float = 1.0,
        batch_size: int = 1024,
        use_features: bool = True,
        track_val_metric: bool = False,
        user_cols: Optional[dict] = None,
        item_cols: Optional[dict] = None,
        seed: Optional[int] = None,
        embedding_dim: Optional[int] = None,  # legacy alias
        phi_dim: Optional[int] = None,  # legacy alias
    ):
        if embedding_dim is not None:
            embedding_sizes = (embedding_dim, embedding_dim, embedding_dim)
        if phi_dim is not None:
            dim_head = phi_dim
        self.embedding_sizes = tuple(embedding_sizes)
        self.hidden_layers = tuple(hidden_layers)
        self.wide_out_dim = wide_out_dim
        self.deep_out_dim = deep_out_dim
        self.head_dropout = head_dropout
        self.deep_dropout = deep_dropout
        self.dim_head = dim_head
        self.epochs = epochs
        self.learning_rate = learning_rate
        self.lr_min = lr_min
        self.loss = loss
        self.cnt_neg_samples = cnt_neg_samples
        self.cnt_samples_for_predict = cnt_samples_for_predict
        self.exploration_coef = exploration_coef
        self.exploration = exploration
        self.nu = nu
        self.lambda_reg = lambda_reg
        self.batch_size = batch_size
        self.use_features = use_features
        self.track_val_metric = track_val_metric
        self.user_cols = user_cols
        self.item_cols = item_cols
        self._seed = seed
        self.val_history: list = []

    @property
    def _init_args(self):
        return {
            "embedding_sizes": list(self.embedding_sizes),
            "hidden_layers": list(self.hidden_layers),
            "wide_out_dim": self.wide_out_dim,
            "deep_out_dim": self.deep_out_dim,
            "head_dropout": self.head_dropout,
            "deep_dropout": self.deep_dropout,
            "dim_head": self.dim_head,
            "epochs": self.epochs,
            "learning_rate": self.learning_rate,
            "lr_min": self.lr_min,
            "loss": self.loss,
            "cnt_neg_samples": self.cnt_neg_samples,
            "cnt_samples_for_predict": self.cnt_samples_for_predict,
            "exploration_coef": self.exploration_coef,
            "exploration": self.exploration,
            "nu": self.nu,
            "lambda_reg": self.lambda_reg,
            "batch_size": self.batch_size,
            "use_features": self.use_features,
            "track_val_metric": self.track_val_metric,
            "user_cols": self.user_cols,
            "item_cols": self.item_cols,
            "seed": self._seed,
        }

    def _get_save_state(self):
        if not hasattr(self, "params"):
            return {}
        state = {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "_user_feats": self._user_feats,
            "_user_blocks": self._user_blocks,
            "_user_spec": self._user_spec,
            "_item_feats": self._item_feats,
            "_item_blocks": self._item_blocks,
            "_item_spec": self._item_spec,
        }
        if getattr(self, "head", None) is not None:
            state["head"] = np.asarray(self.head)
        if getattr(self, "_a_inv", None) is not None:
            state["_a_inv"] = np.asarray(self._a_inv)
        return state

    def _load_model(self, path: str):
        super()._load_model(path)
        if hasattr(self, "params"):
            self._net = _WideDeep(
                n_users=len(self.fit_queries),
                n_items=len(self.fit_items),
                user_embed=self.embedding_sizes[0],
                item_embed=self.embedding_sizes[1],
                crossed_embed=self.embedding_sizes[2],
                hidden_layers=self.hidden_layers,
                wide_out_dim=self.wide_out_dim,
                deep_out_dim=self.deep_out_dim,
                dim_head=self.dim_head,
                deep_dropout=self.deep_dropout,
                head_dropout=self.head_dropout,
            )

    # ---------------------------------------------------------------- fit

    def _epoch_samples(self, rng, pos_u, pos_i, neg_pool, pool_off, trials):
        """Per-epoch WARP trial matrix / flat negative rows.

        ``neg_pool``/``pool_off``: per-user flat pool of negative item ids
        (observed zero-reward + ``cnt_neg_samples`` fresh unseen draws).
        """
        sizes = np.diff(pool_off)
        has = sizes[pos_u] > 0
        draw = rng.integers(
            0, np.maximum(sizes[pos_u], 1)[:, None], size=(len(pos_u), trials)
        )
        idx = pool_off[pos_u][:, None] + draw
        return neg_pool[idx], has.astype(np.float32)

    def _build_pools(self, rng, n_users, n_items, pos_by_user, obs_neg_by_user):
        pools, offs = [], [0]
        for u in range(n_users):
            seen = pos_by_user[u]
            draw = rng.integers(0, n_items, size=2 * self.cnt_neg_samples + len(seen))
            unseen = draw[~np.isin(draw, seen)][: self.cnt_neg_samples]
            pool = np.concatenate([obs_neg_by_user[u], unseen]).astype(np.int32)
            pools.append(pool)
            offs.append(offs[-1] + len(pool))
        return np.concatenate(pools) if pools else np.zeros(0, np.int32), np.array(offs)

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        users = np.searchsorted(
            self.fit_queries, inter[self.query_column].to_numpy()
        ).astype(np.int32)
        items = np.searchsorted(
            self.fit_items, inter[self.item_column].to_numpy()
        ).astype(np.int32)
        rewards = (
            (inter[self.rating_column].to_numpy(dtype=np.float32) > 0).astype(np.float32)
            if self.rating_column in inter.columns
            else np.ones(len(inter), dtype=np.float32)
        )
        n_users, n_items = len(self.fit_queries), len(self.fit_items)

        if self.use_features:
            self._user_feats, self._user_blocks, self._user_spec = _encode_features(
                dataset.query_features, self.query_column, self.fit_queries,
                self.user_cols,
            )
            self._item_feats, self._item_blocks, self._item_spec = _encode_features(
                dataset.item_features, self.item_column, self.fit_items,
                self.item_cols,
            )
        else:
            empty_u = np.zeros((n_users, 0), np.float32)
            empty_i = np.zeros((n_items, 0), np.float32)
            self._user_feats, self._user_blocks, self._user_spec = (
                empty_u, {"wide": empty_u, "continuous": empty_u, "cat": empty_u}, None,
            )
            self._item_feats, self._item_blocks, self._item_spec = (
                empty_i, {"wide": empty_i, "continuous": empty_i, "cat": empty_i}, None,
            )

        net = _WideDeep(
            n_users=n_users,
            n_items=n_items,
            user_embed=self.embedding_sizes[0],
            item_embed=self.embedding_sizes[1],
            crossed_embed=self.embedding_sizes[2],
            hidden_layers=self.hidden_layers,
            wide_out_dim=self.wide_out_dim,
            deep_out_dim=self.deep_out_dim,
            dim_head=self.dim_head,
            deep_dropout=self.deep_dropout,
            head_dropout=self.head_dropout,
        )
        self._net = net

        # device-resident feature blocks, gathered inside the jitted step
        uw = jnp.asarray(self._user_blocks["wide"])
        uc = jnp.asarray(self._user_blocks["continuous"])
        ucat = jnp.asarray(self._user_blocks["cat"])
        iw = jnp.asarray(self._item_blocks["wide"])
        ic = jnp.asarray(self._item_blocks["continuous"])
        icat = jnp.asarray(self._item_blocks["cat"])

        def feats(u, i):
            wide = jnp.concatenate([uw[u], iw[i]], axis=-1)
            cont = jnp.concatenate([uc[u], ic[i]], axis=-1)
            cat = jnp.concatenate([ucat[u], icat[i]], axis=-1)
            return wide, cont, cat

        key = jax.random.PRNGKey(self._seed or 0)
        z = jnp.zeros(1, jnp.int32)
        params = net.init(
            {"params": key, "dropout": key}, z, z, *feats(z, z), deterministic=True
        )["params"]

        pos_mask = rewards > 0
        pos_u, pos_i = users[pos_mask], items[pos_mask]
        trials = max(1, min(self.cnt_neg_samples, 64))
        steps_per_epoch = max(1, -(-len(pos_u) // min(self.batch_size, max(len(pos_u), 1))))
        lr = optax.cosine_decay_schedule(
            self.learning_rate,
            decay_steps=max(1, self.epochs * steps_per_epoch),
            alpha=self.lr_min / self.learning_rate,
        )
        tx = optax.adamw(lr)
        opt_state = tx.init(params)

        @jax.jit
        def warp_step(params, opt_state, u, pi, negs, valid, key):
            def loss_fn(p):
                pos = net.apply(
                    {"params": p}, u, pi, *feats(u, pi),
                    deterministic=False, rngs={"dropout": key},
                )
                b, t = negs.shape
                uf = jnp.repeat(u, t)
                nf = negs.reshape(-1)
                neg = net.apply(
                    {"params": p}, uf, nf, *feats(uf, nf),
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(key, 1)},
                ).reshape(b, t)
                return _warp_loss(pos, neg, n_items, valid) / jnp.maximum(
                    jnp.sum(valid), 1.0
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def logistic_step(params, opt_state, u, i, label, key):
            def loss_fn(p):
                pred = net.apply(
                    {"params": p}, u, i, *feats(u, i),
                    deterministic=False, rngs={"dropout": key},
                )
                return _w_log_loss(pred, label)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # per-user index structures for negative pools
        order = np.argsort(users, kind="stable")
        su, si, sr = users[order], items[order], rewards[order]
        bounds = np.searchsorted(su, np.arange(n_users + 1))
        pos_by_user = [
            si[bounds[u]: bounds[u + 1]][sr[bounds[u]: bounds[u + 1]] > 0]
            for u in range(n_users)
        ]
        obs_neg_by_user = [
            si[bounds[u]: bounds[u + 1]][sr[bounds[u]: bounds[u + 1]] <= 0]
            for u in range(n_users)
        ]

        rng = np.random.default_rng(self._seed)
        bsz = min(self.batch_size, max(len(pos_u), 1))
        step_no = 0
        for _epoch in range(self.epochs):
            # SamplerWithReset: fresh negative pools every epoch
            neg_pool, pool_off = self._build_pools(
                rng, n_users, n_items, pos_by_user, obs_neg_by_user
            )
            perm = rng.permutation(len(pos_u))
            if self.loss == "warp":
                negs, valid = self._epoch_samples(
                    rng, pos_u[perm], pos_i[perm], neg_pool, pool_off, trials
                )
                for s in range(0, len(perm), bsz):
                    rows = slice(s, s + bsz)
                    bu, bi = pos_u[perm][rows], pos_i[perm][rows]
                    bn, bv = negs[rows], valid[rows]
                    if len(bu) < bsz:
                        # tile (not slice) the partial batch: it may hold
                        # fewer rows than the padding needed
                        pad = bsz - len(bu)
                        idx = np.resize(np.arange(len(bu)), pad)
                        bu = np.concatenate([bu, bu[idx]])
                        bi = np.concatenate([bi, bi[idx]])
                        bn = np.concatenate([bn, bn[idx]])
                        bv = np.concatenate([bv, np.zeros(pad, np.float32)])
                    params, opt_state, _ = warp_step(
                        params, opt_state, jnp.asarray(bu), jnp.asarray(bi),
                        jnp.asarray(bn), jnp.asarray(bv),
                        jax.random.fold_in(key, step_no),
                    )
                    step_no += 1
            else:
                # flat labeled rows: positives + the whole negative pool
                flat_u = np.concatenate(
                    [pos_u, np.repeat(np.arange(n_users), np.diff(pool_off))]
                ).astype(np.int32)
                flat_i = np.concatenate([pos_i, neg_pool]).astype(np.int32)
                flat_y = np.concatenate(
                    [np.ones(len(pos_u), np.float32), np.zeros(len(neg_pool), np.float32)]
                )
                p2 = rng.permutation(len(flat_u))
                for s in range(0, len(p2), bsz):
                    rows = p2[s: s + bsz]
                    if len(rows) < bsz:
                        rows = np.resize(rows, bsz)
                    params, opt_state, _ = logistic_step(
                        params, opt_state,
                        jnp.asarray(flat_u[rows]), jnp.asarray(flat_i[rows]),
                        jnp.asarray(flat_y[rows]),
                        jax.random.fold_in(key, step_no),
                    )
                    step_no += 1
            if self.track_val_metric:
                self.val_history.append(
                    self._val_precision(params, net, feats, pos_by_user, k=10)
                )

        self.params = params

        if self.exploration == "linear":
            # design matrix A = λI + Σ φφᵀ over the log (posterior sampling)
            d = self.dim_head
            a = self.lambda_reg * np.eye(d, dtype=np.float64)
            phi_fn = jax.jit(
                lambda u, i: net.apply(
                    {"params": params}, u, i, *feats(u, i),
                    deterministic=True, method=_WideDeep.phi,
                )
            )
            w_sum = np.zeros(d)
            for start in range(0, len(users), 8192):
                u = jnp.asarray(users[start: start + 8192])
                i = jnp.asarray(items[start: start + 8192])
                phi = np.asarray(phi_fn(u, i), dtype=np.float64)
                a += phi.T @ phi
                w_sum += phi.T @ rewards[start: start + 8192].astype(np.float64)
            self._a_inv = np.linalg.inv(a)
            # ridge head on observed rewards (paper: posterior mean)
            self.head = (self._a_inv @ w_sum).astype(np.float32)

    def _val_precision(self, params, net, feats, pos_by_user, k=10):
        """Reference predict_val_with_ndcg (hits@k / k over val users)."""
        n_users = len(self.fit_queries)
        n_items = len(self.fit_items)
        sample = np.arange(0, n_users, max(1, n_users // 64))
        hits, cnt = 0.0, 0

        def score(u, i):
            return net.apply({"params": params}, u, i, *feats(u, i), deterministic=True)
        all_items = jnp.arange(n_items, dtype=jnp.int32)
        for u in sample:
            truth = pos_by_user[u]
            if len(truth) == 0:
                continue
            s = np.asarray(score(jnp.full(n_items, u, jnp.int32), all_items))
            top = np.argsort(-s)[:k]
            hits += np.isin(top, truth).sum() / k
            cnt += 1
        return hits / max(cnt, 1)

    # ------------------------------------------------------------- predict

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        q_pos = np.searchsorted(self.fit_queries, query_ids).astype(np.int32)
        i_pos = np.searchsorted(self.fit_items, item_ids).astype(np.int32)
        b, m = len(q_pos), len(i_pos)
        u = jnp.repeat(jnp.asarray(q_pos)[:, None], m, axis=1).reshape(-1)
        v = jnp.tile(jnp.asarray(i_pos)[None, :], (b, 1)).reshape(-1)

        def blocks(tbl, idx):
            return jnp.asarray(tbl)[idx]

        wide = jnp.concatenate(
            [blocks(self._user_blocks["wide"], u), blocks(self._item_blocks["wide"], v)],
            axis=-1,
        )
        cont = jnp.concatenate(
            [blocks(self._user_blocks["continuous"], u),
             blocks(self._item_blocks["continuous"], v)], axis=-1,
        )
        cat = jnp.concatenate(
            [blocks(self._user_blocks["cat"], u), blocks(self._item_blocks["cat"], v)],
            axis=-1,
        )
        phi = self._net.apply(
            {"params": self.params}, u, v, wide, cont, cat,
            deterministic=True, method=_WideDeep.phi,
        )

        if self.exploration == "linear":
            rng = np.random.default_rng(self._seed)
            w = rng.multivariate_normal(
                self.head.astype(np.float64), self.nu**2 * self._a_inv
            ).astype(np.float32)
            return np.asarray(phi @ jnp.asarray(w)).reshape(b, m)

        # MC-dropout: cnt_samples_for_predict stochastic head passes
        # (reference predict_test → mean + coef·std, neural_ts.py:909)
        key = jax.random.PRNGKey((self._seed or 0) + 1)
        last = jax.jit(
            lambda p: self._net.apply({"params": self.params}, p, method=_WideDeep.last)
        )
        keys = jax.random.split(key, self.cnt_samples_for_predict)

        def one(k):
            keep = jax.random.bernoulli(k, 1.0 - self.head_dropout, phi.shape)
            dropped = jnp.where(keep, phi / (1.0 - self.head_dropout), 0.0)
            return last(dropped)

        samples = jnp.stack([one(k) for k in keys])  # [S, B*M]
        mean = jnp.mean(samples, axis=0)
        std = jnp.sqrt(jnp.var(samples, axis=0))
        return np.asarray(mean + self.exploration_coef * std).reshape(b, m)
