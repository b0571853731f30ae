"""DT4Rec: decision transformer for recommendation (arXiv 2304.03843 line).

TPU-native analog of the reference (reference:
replay/experimental/models/dt4rec/* — GPT-1 blocks + trainer, ~978 LoC of
torch).  The GPT stack reuses replay_tpu's transformer layer; each timestep
contributes (return-to-go, item, position) embeddings summed into one
token, a causal encoder predicts the next item, and at inference the model
is conditioned on the maximum observed return (the "act greedily for high
return" decision-transformer trick).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import Recommender
from replay_tpu.nn.attention import build_attention_bias
from replay_tpu.nn.sequential.sasrec import SasRecTransformerLayer


class _DTBody(nn.Module):
    n_items: int
    max_len: int
    dim: int = 64
    blocks: int = 2
    heads: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, items, rtg, padding_mask, deterministic: bool = True):
        item_emb = nn.Embed(self.n_items + 1, self.dim, name="item_emb")(items)
        rtg_emb = nn.Dense(self.dim, name="rtg_emb")(rtg[..., None])
        pos_emb = nn.Embed(self.max_len, self.dim, name="pos_emb")(
            jnp.arange(items.shape[1])
        )
        x = item_emb + rtg_emb + pos_emb[None]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x * padding_mask[..., None].astype(x.dtype)
        bias = build_attention_bias(padding_mask, causal=True)
        for i in range(self.blocks):
            x = SasRecTransformerLayer(
                num_heads=self.heads,
                hidden_dim=self.dim * 4,
                dropout_rate=self.dropout,
                depth=i + 1,
                dtype=jnp.float32,
                name=f"layer_{i}",
            )(x, bias, deterministic=deterministic)
        logits = nn.Dense(self.n_items, name="head")(x)
        return logits


class DT4Rec(Recommender):
    """Decision transformer conditioned on return-to-go."""

    def __init__(
        self,
        max_sequence_length: int = 32,
        embedding_dim: int = 64,
        num_blocks: int = 2,
        num_heads: int = 2,
        learning_rate: float = 1e-3,
        epochs: int = 20,
        batch_size: int = 64,
        seed: Optional[int] = None,
    ):
        self.max_sequence_length = max_sequence_length
        self.embedding_dim = embedding_dim
        self.num_blocks = num_blocks
        self.num_heads = num_heads
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.batch_size = batch_size
        self._seed = seed
        self.params = None

    @property
    def _init_args(self):
        return {
            "max_sequence_length": self.max_sequence_length,
            "embedding_dim": self.embedding_dim,
            "num_blocks": self.num_blocks,
            "num_heads": self.num_heads,
            "learning_rate": self.learning_rate,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "seed": self._seed,
        }

    def _sequences(self, dataset: Dataset):
        inter = dataset.interactions
        sort_cols = [self.query_column]
        if self.timestamp_column in inter.columns:
            sort_cols.append(self.timestamp_column)
        frame = inter.sort_values(sort_cols, kind="stable")
        items = np.searchsorted(self.fit_items, frame[self.item_column].to_numpy())
        ratings = (
            frame[self.rating_column].to_numpy(dtype=np.float32)
            if self.rating_column in frame.columns
            else np.ones(len(frame), dtype=np.float32)
        )
        q = frame[self.query_column].to_numpy()
        uniq, starts = np.unique(q, return_index=True)
        offsets = np.append(starts, len(q))
        return uniq, items, ratings, offsets

    def _pad_batch(self, rows, items, ratings, offsets, length):
        n_items = len(self.fit_items)
        out_items = np.full((len(rows), length), n_items, dtype=np.int32)
        out_rtg = np.zeros((len(rows), length), dtype=np.float32)
        mask = np.zeros((len(rows), length), dtype=np.int8)
        for r, u in enumerate(rows):
            lo, hi = offsets[u], offsets[u + 1]
            take = min(length, hi - lo)
            seq = items[hi - take : hi]
            rew = ratings[hi - take : hi]
            rtg = np.cumsum(rew[::-1])[::-1]  # return-to-go
            out_items[r, length - take :] = seq
            out_rtg[r, length - take :] = rtg
            mask[r, length - take :] = 1
        return out_items, out_rtg, mask

    def _fit(self, dataset: Dataset) -> None:
        uniq, items, ratings, offsets = self._sequences(dataset)
        self._seq_cache = (uniq, items, ratings, offsets)
        n_items = len(self.fit_items)
        length = self.max_sequence_length
        model = _DTBody(
            n_items=n_items,
            max_len=length,
            dim=self.embedding_dim,
            blocks=self.num_blocks,
            heads=self.num_heads,
        )
        self._model = model
        key = jax.random.PRNGKey(self._seed or 0)
        dummy = (
            jnp.zeros((1, length), jnp.int32),
            jnp.zeros((1, length), jnp.float32),
            jnp.ones((1, length), jnp.int8),
        )
        params = model.init({"params": key, "dropout": key}, *dummy, deterministic=True)["params"]
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, its, rtg, mask, key):
            # next-token: inputs [:-1] predict items [1:]
            inp_i, inp_r, inp_m = its[:, :-1], rtg[:, :-1], mask[:, :-1]
            labels, label_m = its[:, 1:], mask[:, 1:]

            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, inp_i, inp_r, inp_m,
                    deterministic=False, rngs={"dropout": key},
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                safe = jnp.where(label_m > 0, labels, 0)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                m = label_m.astype(jnp.float32)
                return jnp.sum(jnp.where(m > 0, nll, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(self._seed)
        n = len(uniq)
        bsz = min(self.batch_size, n)
        step_no = 0
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                its, rtg, mask = self._pad_batch(rows, items, ratings, offsets, length + 1)
                params, opt_state, _ = step(
                    params, opt_state,
                    jnp.asarray(its), jnp.asarray(rtg), jnp.asarray(mask),
                    jax.random.fold_in(key, step_no),
                )
                step_no += 1
        self.params = params
        self._max_rtg = float(np.max(ratings)) * length

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        uniq, items, ratings, offsets = self._seq_cache
        rows = np.searchsorted(uniq, query_ids)
        length = self.max_sequence_length
        its, rtg, mask = self._pad_batch(rows, items, ratings, offsets, length)
        # condition on a high target return: shift all rtg up to the max
        rtg = rtg + (self._max_rtg - rtg[:, -1:])
        logits = self._model.apply(
            {"params": self.params},
            jnp.asarray(its), jnp.asarray(rtg), jnp.asarray(mask),
            deterministic=True,
        )
        last = np.asarray(logits)[:, -1, :]
        item_pos = np.searchsorted(self.fit_items, item_ids)
        return last[:, item_pos]
