"""DT4Rec: decision transformer for recommendation (arXiv 2106.01345 line).

TPU-native analog of the reference (reference:
replay/experimental/models/dt4rec/{dt4rec,gpt1,trainer,utils}.py, ~978 LoC
torch).  Capability parity with the reference's full pipeline:

- **MDP trajectories** (reference ``utils.create_dataset``): per user,
  reward_t = 1 iff rating > ``reward_threshold``; the state before action t
  is a memory of the last ``memory_size`` *relevant* items (irrelevant
  actions leave the memory unchanged); returns-to-go are the reversed
  cumulative rewards.  Built fully vectorized in numpy (the reference
  iterates rows in Python).
- **DRR state representation** (reference ``gpt1.StateReprModule``, DRR
  paper arXiv 1810.12027): state embedding = Dense([u, u⊙ave, ave]) where
  ave is a learned-weight average of the memory item embeddings.
- **Interleaved GPT** (reference ``gpt1.GPT.forward``): each timestep
  contributes three tokens (return-to-go, state, action) to a causal
  transformer over 3·T positions; local positional embeddings plus a global
  per-window timestep embedding; next-action logits are read at the state
  positions; action embeddings share the state memory's item table.
- **Windowed sampling** (reference ``StateActionReturnDataset``): one
  training sample per (user, window start), windows of ``trajectory_len``
  steps, short tails left-padded; the window start feeds the global
  timestep embedding.
- **Trainer parity** (reference ``trainer.Trainer`` + ``WarmUpScheduler``):
  AdamW(betas=(0.9, 0.95)) with weight decay masked off embeddings/
  biases/LayerNorms (reference ``GPT.configure_optimizers``), Noam warmup
  schedule ``dim^-0.5 · min(step^-0.5, step·warmup^-1.5)``, and global
  gradient-norm clipping at 1.0 — all in one jitted optax step.
- **Return-conditioned inference** (reference ``ValidateDataset``): the
  scoring context is the trailing window with the final slot's
  return-to-go forced to ``predict_rtg`` (reference hardcodes 10) — "act
  as if a high return is achievable".  Because the stack is causal, the
  final slot's (absent) action token cannot influence the state-position
  logits, so the training-shape forward serves inference unchanged.

Everything device-side is static-shape and jit-compiled once; the loss is
masked CE over real action positions (the reference feeds pad targets to
CE — masking is the strictly-cleaner equivalent).
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


def build_trajectories(
    items: np.ndarray,
    ratings: np.ndarray,
    offsets: np.ndarray,
    *,
    n_items: int,
    memory_size: int = 3,
    reward_threshold: float = 3.0,
):
    """Vectorized MDP trajectory construction.

    Reference semantics (replay/experimental/models/dt4rec/utils.py:193
    ``create_dataset``): per user (rows already time-sorted within each
    user), ``reward_t = 1`` iff rating > threshold; the state before action
    t is the last ``memory_size`` relevant items (pad = ``n_items`` when
    fewer); relevance-0 steps do not advance the memory; rtg = reversed
    cumulative rewards.

    :param offsets: [n_users + 1] row ranges per user into the flat arrays.
    :returns: (states [total, memory_size] int32, rewards [total] int8,
        rtgs [total] float32)
    """
    total = len(items)
    rewards = (ratings > reward_threshold).astype(np.int8)
    user_of = np.repeat(
        np.arange(len(offsets) - 1), np.diff(offsets)
    )  # [total]

    # per-user exclusive cumsum of rewards = number of relevant actions
    # strictly before each position
    csum = np.cumsum(rewards)
    csum_excl = np.concatenate([[0], csum[:-1]])
    base = csum_excl[offsets[:-1]]  # relevant count before each user's rows
    k = csum_excl - base[user_of]  # [total] per-user exclusive counts

    # flat array of relevant items per user (in order) + its offsets
    rel_mask = rewards.astype(bool)
    rel_items = items[rel_mask]
    rel_counts = np.add.reduceat(rewards.astype(np.int64), offsets[:-1]) if total else np.zeros(0, np.int64)
    if total == 0:
        rel_counts = np.zeros(len(offsets) - 1, dtype=np.int64)
    rel_offsets = np.concatenate([[0], np.cumsum(rel_counts)])

    # memory slot j (oldest → newest): the (k - memory_size + j)-th relevant
    # item of the user, pad when that index is negative
    slot = k[:, None] - memory_size + np.arange(memory_size)[None, :]  # [total, M]
    valid = slot >= 0
    gather = rel_offsets[user_of][:, None] + np.clip(slot, 0, None)
    states = np.full((total, memory_size), n_items, dtype=np.int32)
    if len(rel_items):
        np.copyto(states, rel_items[np.minimum(gather, len(rel_items) - 1)], where=valid)

    # rtg: per-user reversed cumsum of rewards
    tail = csum[np.minimum(offsets[1:] - 1, total - 1)] if total else np.zeros(0, np.int64)
    rtgs = (tail[user_of] - csum_excl).astype(np.float32)
    return states, rewards, rtgs


class _StateRepr(nn.Module):
    """DRR state module (reference: gpt1.py:137 StateReprModule)."""

    n_users: int
    n_items: int
    dim: int
    memory_size: int

    @nn.compact
    def __call__(self, users, memory):
        # users [B], memory [B, M] (pad id = n_items)
        init = nn.initializers.normal(stddev=0.01)
        u = nn.Embed(self.n_users, self.dim, embedding_init=init, name="user_emb")(users)
        item_table = self.param(
            "item_emb",
            lambda key, shape: init(key, shape).at[self.n_items].set(0.0),
            (self.n_items + 1, self.dim),
        )
        mem = jnp.take(item_table, memory, axis=0)  # [B, M, D]
        # conv1d(in=memory, out=1, kernel=1) ≡ learned weighted sum over
        # memory slots + scalar bias (reference drr_ave)
        w = self.param("ave_w", nn.initializers.uniform(scale=1.0), (self.memory_size,))
        b = self.param("ave_b", nn.initializers.zeros, ())
        ave = jnp.einsum("bmd,m->bd", mem, w) + b
        out = jnp.concatenate([u, u * ave, ave], axis=-1)
        return nn.Dense(self.dim, name="proj")(out), item_table


class _DTGPT(nn.Module):
    """Interleaved (rtg, state, action) causal GPT (reference: gpt1.py:190)."""

    n_users: int
    n_items: int
    memory_size: int
    trajectory_len: int
    max_timestep: int
    dim: int = 64
    blocks: int = 2
    heads: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, states, actions, rtgs, timesteps, users, padding_mask,
                 deterministic: bool = True):
        # states [B,T,M] int32, actions [B,T] int32 (pad = n_items),
        # rtgs [B,T] f32, timesteps [B] int32, users [B] int32,
        # padding_mask [B,T] (1 = real step)
        b, t = actions.shape
        users_rep = jnp.repeat(users[:, None], t, axis=1).reshape(-1)
        state_e, item_table = _StateRepr(
            n_users=self.n_users,
            n_items=self.n_items,
            dim=self.dim,
            memory_size=self.memory_size,
            name="state_repr",
        )(users_rep, states.reshape(-1, self.memory_size))
        state_e = state_e.reshape(b, t, self.dim)

        rtg_e = jnp.tanh(nn.Dense(self.dim, name="ret_emb")(rtgs[..., None]))
        # action embeddings share the state memory's item table (reference:
        # gpt1.py:227 action_embeddings = state_repr.item_embeddings + tanh)
        act_e = jnp.tanh(jnp.take(item_table, actions, axis=0))

        tokens = jnp.stack([rtg_e, state_e, act_e], axis=2).reshape(b, 3 * t, self.dim)

        pos = self.param(
            "pos_emb", nn.initializers.zeros, (3 * self.trajectory_len, self.dim)
        )
        global_pos = self.param(
            "global_pos_emb", nn.initializers.zeros, (self.max_timestep + 1, self.dim)
        )
        tstep = jnp.clip(timesteps, 0, self.max_timestep)
        tokens = tokens + pos[None, : 3 * t] + jnp.take(global_pos, tstep, axis=0)[:, None]
        tokens = nn.Dropout(self.dropout)(tokens, deterministic=deterministic)

        token_mask = jnp.repeat(padding_mask, 3, axis=1)  # [B, 3T]
        bias = build_attention_bias(token_mask, causal=True)
        x = tokens
        for i in range(self.blocks):
            x = SasRecTransformerLayer(
                num_heads=self.heads,
                hidden_dim=self.dim * 4,
                dropout_rate=self.dropout,
                depth=i + 1,
                dtype=jnp.float32,
                name=f"layer_{i}",
            )(x, bias, deterministic=deterministic)
        x = nn.LayerNorm(name="ln_f")(x)
        logits = nn.Dense(self.n_items, use_bias=False, name="head")(x)
        return logits[:, 1::3, :]  # predictions at the state positions


def _noam_schedule(peak_lr: float, warmup_steps: int):
    """Reference WarmUpScheduler/calc_lr (utils.py:186), normalized so the
    schedule peaks at ``peak_lr`` after ``warmup_steps`` (linear warmup,
    inverse-sqrt decay)."""

    def lr(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        return peak_lr * warmup_steps**0.5 * jnp.minimum(
            s ** (-0.5), s * warmup_steps ** (-1.5)
        )

    return lr


def _decay_mask(params):
    """Weight decay only on Dense kernels — embeddings, biases, LayerNorm
    scales stay undecayed (reference GPT.configure_optimizers, gpt1.py:246)."""

    def mask_node(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        is_kernel = path and getattr(path[-1], "key", None) == "kernel"
        is_embed = any(s in name for s in ("emb", "embedding"))
        return bool(is_kernel and not is_embed)

    return jax.tree_util.tree_map_with_path(mask_node, params)


class DT4Rec(Recommender):
    """Decision transformer conditioned on return-to-go.

    :param trajectory_len: training window length (reference default 30).
    :param memory_size: DRR state memory size (reference: 3).
    :param reward_threshold: rating cutoff for reward 1 (reference
        hardcodes ``relevance > 3``; lower it for implicit-feedback logs).
    :param predict_rtg: return-to-go injected at the final inference slot
        (reference ValidateDataset sets 10).
    """

    def __init__(
        self,
        trajectory_len: int = 30,
        memory_size: int = 3,
        embedding_dim: int = 64,
        num_blocks: int = 2,
        num_heads: int = 2,
        dropout: float = 0.1,
        reward_threshold: float = 3.0,
        predict_rtg: float = 10.0,
        learning_rate: float = 3e-4,
        warmup_steps: int = 100,
        weight_decay: float = 0.1,
        epochs: int = 1,
        batch_size: int = 64,
        seed: Optional[int] = None,
        max_sequence_length: Optional[int] = None,
    ):
        if max_sequence_length is not None:  # legacy alias
            trajectory_len = max_sequence_length
        self.trajectory_len = trajectory_len
        self.memory_size = memory_size
        self.embedding_dim = embedding_dim
        self.num_blocks = num_blocks
        self.num_heads = num_heads
        self.dropout = dropout
        self.reward_threshold = reward_threshold
        self.predict_rtg = predict_rtg
        self.learning_rate = learning_rate
        self.warmup_steps = warmup_steps
        self.weight_decay = weight_decay
        self.epochs = epochs
        self.batch_size = batch_size
        self._seed = seed
        self.params = None

    @property
    def _init_args(self):
        return {
            "trajectory_len": self.trajectory_len,
            "memory_size": self.memory_size,
            "embedding_dim": self.embedding_dim,
            "num_blocks": self.num_blocks,
            "num_heads": self.num_heads,
            "dropout": self.dropout,
            "reward_threshold": self.reward_threshold,
            "predict_rtg": self.predict_rtg,
            "learning_rate": self.learning_rate,
            "warmup_steps": self.warmup_steps,
            "weight_decay": self.weight_decay,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "seed": self._seed,
        }

    def _get_save_state(self):
        if self.params is None:
            return {}
        return {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "_seq_cache": self._seq_cache,
            "_traj_cache": self._traj_cache,
        }

    def _load_model(self, path: str):
        super()._load_model(path)
        if getattr(self, "params", None) is not None:
            uniq, _items, _ratings, offsets = self._seq_cache
            self._model = _DTGPT(
                n_users=len(uniq),
                n_items=len(self.fit_items),
                memory_size=self.memory_size,
                trajectory_len=self.trajectory_len,
                max_timestep=int(max(1, (offsets[1:] - offsets[:-1]).max())),
                dim=self.embedding_dim,
                blocks=self.num_blocks,
                heads=self.num_heads,
                dropout=self.dropout,
            )

    # ----------------------------------------------------------------- data

    def _sequences(self, dataset: Dataset):
        inter = dataset.interactions
        sort_cols = [self.query_column]
        if self.timestamp_column in inter.columns:
            sort_cols.append(self.timestamp_column)
        frame = inter.sort_values(sort_cols, kind="stable")
        items = np.searchsorted(
            self.fit_items, frame[self.item_column].to_numpy()
        ).astype(np.int32)
        ratings = (
            frame[self.rating_column].to_numpy(dtype=np.float32)
            if self.rating_column in frame.columns
            else np.ones(len(frame), dtype=np.float32)
        )
        q = frame[self.query_column].to_numpy()
        uniq, starts = np.unique(q, return_index=True)
        offsets = np.append(starts, len(q)).astype(np.int64)
        return uniq, items, ratings, offsets

    def _window_batch(self, rows, starts):
        """Right-aligned fixed-length windows (reference Collator pads left).

        :returns: states [B,T,M], actions [B,T], rtgs [B,T], mask [B,T],
            timesteps [B]
        """
        _, items, _, offsets = self._seq_cache
        states_all, _, rtgs_all = self._traj_cache
        t, m = self.trajectory_len, self.memory_size
        n_items = len(self.fit_items)
        bsz = len(rows)
        lens = (offsets[rows + 1] - offsets[rows]).astype(np.int64)
        take = np.minimum(t, lens - starts)
        # source flat index for window slot j: user_start + start + (j - (T - take))
        j = np.arange(t)[None, :]
        src = offsets[rows][:, None] + starts[:, None] + j - (t - take)[:, None]
        valid = j >= (t - take)[:, None]
        src_safe = np.clip(src, 0, len(items) - 1)

        actions = np.where(valid, items[src_safe], n_items).astype(np.int32)
        rtgs = np.where(valid, rtgs_all[src_safe], 0.0).astype(np.float32)
        states = np.full((bsz, t, m), n_items, dtype=np.int32)
        np.copyto(states, states_all[src_safe], where=valid[..., None])
        mask = valid.astype(np.int8)
        return states, actions, rtgs, mask, starts.astype(np.int32)

    # ------------------------------------------------------------------ fit

    def _fit(self, dataset: Dataset) -> None:
        uniq, items, ratings, offsets = self._sequences(dataset)
        self._seq_cache = (uniq, items, ratings, offsets)
        n_items = len(self.fit_items)
        states, rewards, rtgs = build_trajectories(
            items, ratings, offsets,
            n_items=n_items,
            memory_size=self.memory_size,
            reward_threshold=self.reward_threshold,
        )
        self._traj_cache = (states, rewards, rtgs)

        t = self.trajectory_len
        model = _DTGPT(
            n_users=len(uniq),
            n_items=n_items,
            memory_size=self.memory_size,
            trajectory_len=t,
            max_timestep=int(max(1, (offsets[1:] - offsets[:-1]).max())),
            dim=self.embedding_dim,
            blocks=self.num_blocks,
            heads=self.num_heads,
            dropout=self.dropout,
        )
        self._model = model
        key = jax.random.PRNGKey(self._seed or 0)
        dummy = (
            jnp.zeros((1, t, self.memory_size), jnp.int32),
            jnp.zeros((1, t), jnp.int32),
            jnp.zeros((1, t), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.ones((1, t), jnp.int8),
        )
        params = model.init({"params": key, "dropout": key}, *dummy, deterministic=True)[
            "params"
        ]
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),  # reference Trainer.grad_norm_clip
            optax.adamw(
                _noam_schedule(self.learning_rate, self.warmup_steps),
                b1=0.9,
                b2=0.95,
                weight_decay=self.weight_decay,
                mask=_decay_mask(params),
            ),
        )
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, states, actions, rtgs, tsteps, users, mask, key):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, states, actions, rtgs, tsteps, users, mask,
                    deterministic=False, rngs={"dropout": key},
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                safe = jnp.where(mask > 0, actions, 0)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                mf = mask.astype(jnp.float32)
                return jnp.sum(jnp.where(mask > 0, nll, 0.0)) / jnp.maximum(
                    jnp.sum(mf), 1.0
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # one sample per (user, window start) — reference
        # StateActionReturnDataset enumerates max(1, len - T + 1) windows
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        n_windows = np.maximum(1, lens - t + 1)
        sample_user = np.repeat(np.arange(len(uniq)), n_windows)
        w_off = np.concatenate([[0], np.cumsum(n_windows)])
        sample_start = (np.arange(len(sample_user)) - w_off[sample_user]).astype(
            np.int64
        )

        rng = np.random.default_rng(self._seed)
        n = len(sample_user)
        bsz = min(self.batch_size, n)
        step_no = 0
        for _epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n, bsz):
                rows = order[start : start + bsz]
                if len(rows) < bsz:
                    rows = np.resize(rows, bsz)
                s, a, r, mask, tsteps = self._window_batch(
                    sample_user[rows], sample_start[rows]
                )
                params, opt_state, _ = step(
                    params, opt_state,
                    jnp.asarray(s), jnp.asarray(a), jnp.asarray(r),
                    jnp.asarray(tsteps), jnp.asarray(sample_user[rows].astype(np.int32)),
                    jnp.asarray(mask), jax.random.fold_in(key, step_no),
                )
                step_no += 1
        self.params = params

    # -------------------------------------------------------------- predict

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        uniq, items, ratings, offsets = self._seq_cache
        states_all, rewards, rtgs_all = self._traj_cache
        rows = np.searchsorted(uniq, query_ids)
        t, m = self.trajectory_len, self.memory_size
        n_items = len(self.fit_items)
        lens = (offsets[rows + 1] - offsets[rows]).astype(np.int64)

        # trailing context of T-1 actions + one final conditioning slot
        ctx = np.minimum(t - 1, lens)
        j = np.arange(t - 1)[None, :]
        src = offsets[rows][:, None] + (lens - ctx)[:, None] + j - ((t - 1) - ctx)[:, None]
        valid = j >= ((t - 1) - ctx)[:, None]
        src_safe = np.clip(src, 0, max(len(items) - 1, 0))
        actions = np.where(valid, items[src_safe], n_items).astype(np.int32)
        rtg_ctx = np.where(valid, rtgs_all[src_safe], 0.0).astype(np.float32)
        state_ctx = np.full((len(rows), t - 1, m), n_items, dtype=np.int32)
        if len(items):
            np.copyto(state_ctx, states_all[src_safe], where=valid[..., None])

        # final slot: memory AFTER the last action, high-return conditioning
        final_state = np.full((len(rows), 1, m), n_items, dtype=np.int32)
        rel_tail = np.zeros((len(rows), m), dtype=np.int32) + n_items
        for r, u in enumerate(rows):  # per-row tail of relevant items (tiny)
            lo, hi = offsets[u], offsets[u + 1]
            rel = items[lo:hi][rewards[lo:hi].astype(bool)][-m:]
            if len(rel):
                rel_tail[r, m - len(rel):] = rel
        final_state[:, 0, :] = rel_tail
        states = np.concatenate([state_ctx, final_state], axis=1)
        actions = np.concatenate(
            [actions, np.full((len(rows), 1), n_items, np.int32)], axis=1
        )
        rtgs = np.concatenate(
            [rtg_ctx, np.full((len(rows), 1), self.predict_rtg, np.float32)], axis=1
        )
        mask = np.concatenate(
            [valid.astype(np.int8), np.ones((len(rows), 1), np.int8)], axis=1
        )
        tsteps = np.maximum(lens - (t - 1), 0).astype(np.int32)

        logits = self._model.apply(
            {"params": self.params},
            jnp.asarray(states), jnp.asarray(actions), jnp.asarray(rtgs),
            jnp.asarray(tsteps), jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(mask), deterministic=True,
        )
        last = np.asarray(logits)[:, -1, :]
        item_pos = np.searchsorted(self.fit_items, item_ids)
        return last[:, item_pos]
