"""Word2Vec item embeddings over interaction sequences.

TPU-native replacement for the reference's Spark ML Word2Vec wrapper
(reference: replay/models/word2vec.py:22 Word2VecRec): items are words,
each query's chronological item sequence is a sentence, and the query
vector is the (optionally idf-weighted) mean of its items' vectors
(reference `_get_query_vectors`).

Training is skip-gram with negative sampling (SGNS) as fully-batched jitted
steps: (center, context) pairs are materialized host-side once, then each
step gathers embedding rows and computes pos/neg sigmoid losses — two
gathers + two einsums per step, all MXU/VPU work.  Negatives are drawn from
the unigram^(3/4) distribution (word2vec standard).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from replay_tpu.ann.mixin import ANNMixin
from replay_tpu.data.dataset import Dataset
from replay_tpu.models.base_rec import ItemVectorModel, Recommender

_search_space = {
    "rank": {"type": "int", "args": [50, 300]},
    "window_size": {"type": "int", "args": [1, 100]},
    "use_idf": {"type": "categorical", "args": [True, False]},
}


@partial(jax.jit, static_argnames=("n_negatives",), donate_argnums=(0, 1))
def _sgns_step(
    in_emb, out_emb, centers, contexts, key, lr, n_negatives: int
):
    n_items = in_emb.shape[0]
    negs = jax.random.randint(key, (centers.shape[0], n_negatives), 0, n_items)

    def loss_fn(params):
        win, wout = params
        c = jnp.take(win, centers, axis=0)  # [P, r]
        pos = jnp.take(wout, contexts, axis=0)  # [P, r]
        neg = jnp.take(wout, negs, axis=0)  # [P, n, r]
        pos_logit = jnp.sum(c * pos, axis=-1)
        neg_logit = jnp.einsum("pr,pnr->pn", c, neg)
        # SUM over pairs (not mean): each pair contributes a full SGD update
        # to its rows, matching word2vec's per-sample learning-rate semantics
        loss = -jnp.sum(
            jax.nn.log_sigmoid(pos_logit)
            + jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=-1)
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)((in_emb, out_emb))
    new_in = in_emb - lr * grads[0]
    new_out = out_emb - lr * grads[1]
    return new_in, new_out, loss


class Word2VecRec(ANNMixin, Recommender, ItemVectorModel):
    """Skip-gram item embeddings; query = mean of history item vectors.

    .. note:: ``max_iter`` defaults to 1 to mirror the reference's
       Spark-Word2Vec default (replay/models/word2vec.py:22), which
       UNDERTRAINS on most datasets — one epoch of SGNS rarely converges.
       The examples and the quality table use ``max_iter=5``; raise it (or
       let ``optimize()`` pick it — it is in the default search space) for
       real runs."""

    can_predict_cold_queries = True
    _search_space = _search_space

    def __init__(
        self,
        rank: int = 100,
        min_count: int = 5,
        step_size: float = 0.025,
        max_iter: int = 1,
        window_size: int = 1,
        use_idf: bool = False,
        seed: Optional[int] = None,
        n_negatives: int = 5,
        batch_size: int = 65536,
        index_builder=None,
        num_partitions: Optional[int] = None,  # noqa: ARG002 — reference
        # Spark-Word2Vec knob (replay/models/word2vec.py:22); the jitted SGNS
        # fit has no partitioning to tune
    ):
        self.rank = rank
        self.min_count = min_count
        self.step_size = step_size
        self.max_iter = max_iter
        self.window_size = window_size
        self.use_idf = use_idf
        self._seed = seed
        self.n_negatives = n_negatives
        self.batch_size = batch_size
        self.index_builder = index_builder
        self.vectors: Optional[np.ndarray] = None
        self.idf: Optional[np.ndarray] = None

    @property
    def _init_args(self):
        return {
            "rank": self.rank,
            "min_count": self.min_count,
            "step_size": self.step_size,
            "max_iter": self.max_iter,
            "window_size": self.window_size,
            "use_idf": self.use_idf,
            "seed": self._seed,
            "n_negatives": self.n_negatives,
            "batch_size": self.batch_size,
            "index_builder": None,
        }

    # ------------------------------------------------------------------ fit
    def _build_pairs(self, dataset: Dataset):
        inter = dataset.interactions
        cols = [self.query_column, self.item_column]
        if self.timestamp_column in inter.columns:
            frame = inter.sort_values([self.query_column, self.timestamp_column], kind="stable")
        else:
            frame = inter.sort_values(self.query_column, kind="stable")
        q = frame[self.query_column].to_numpy()
        i_pos = np.searchsorted(self.fit_items, frame[self.item_column].to_numpy())
        # sentence boundaries
        boundaries = np.flatnonzero(np.r_[True, q[1:] != q[:-1], True])
        centers, contexts = [], []
        for w in range(1, self.window_size + 1):
            c = i_pos[:-w]
            t = i_pos[w:]
            same = q[:-w] == q[w:]
            centers.append(c[same])
            contexts.append(t[same])
            # symmetric pairs
            centers.append(t[same])
            contexts.append(c[same])
        del cols, boundaries
        return np.concatenate(centers), np.concatenate(contexts)

    def _fit(self, dataset: Dataset) -> None:
        n_items = len(self.fit_items)
        centers, contexts = self._build_pairs(dataset)
        rng = np.random.default_rng(self._seed)
        if len(centers) == 0:
            # no trainable pairs (all sequences shorter than the window) —
            # the reference's Spark Word2Vec still yields vectors without
            # crashing; keep the untrained init and warn
            self.logger.warning(
                "No skip-gram pairs (sequences too short for window_size); "
                "item vectors are untrained random init"
            )
            self.vectors = (
                (rng.random((n_items, self.rank)).astype(np.float32) - 0.5) / self.rank
            )
            self._fit_idf(dataset)
            if self.ann_enabled:
                self._build_ann_index()
            return

        perm = rng.permutation(len(centers))
        centers, contexts = centers[perm], contexts[perm]

        in_emb = jnp.asarray(
            (rng.random((n_items, self.rank), dtype=np.float32) - 0.5) / self.rank
        )
        out_emb = jnp.zeros((n_items, self.rank), dtype=jnp.float32)
        key = jax.random.PRNGKey(self._seed or 0)
        lr = jnp.float32(self.step_size)

        bsz = self.batch_size
        n_pairs = len(centers)
        # pad to whole batches so one compiled step serves every batch
        padded = -(-n_pairs // bsz) * bsz
        centers = np.resize(centers, padded)
        contexts = np.resize(contexts, padded)
        step_no = 0
        for _ in range(self.max_iter):
            for start in range(0, padded, bsz):
                in_emb, out_emb, _ = _sgns_step(
                    in_emb,
                    out_emb,
                    jnp.asarray(centers[start : start + bsz]),
                    jnp.asarray(contexts[start : start + bsz]),
                    jax.random.fold_in(key, step_no),
                    lr,
                    self.n_negatives,
                )
                step_no += 1
        self.vectors = np.asarray(in_emb)
        self._fit_idf(dataset)
        if self.ann_enabled:
            self._build_ann_index()

    def _fit_idf(self, dataset: Dataset) -> None:
        """idf over queries containing the item (reference use_idf semantics)."""
        inter = dataset.interactions
        pairs = inter[[self.query_column, self.item_column]].drop_duplicates()
        df = np.bincount(
            np.searchsorted(self.fit_items, pairs[self.item_column].to_numpy()),
            minlength=len(self.fit_items),
        ).astype(np.float64)
        n_queries = len(self.fit_queries)
        self.idf = np.log((n_queries + 1) / (df + 1))

    # -------------------------------------------------------------- scoring
    def _query_vectors(self, query_ids: np.ndarray, dataset: Dataset) -> np.ndarray:
        """Mean (idf-weighted) of history item vectors per query."""
        inter = dataset.interactions
        sub = inter[inter[self.query_column].isin(query_ids)]
        q = sub[self.query_column].to_numpy()
        i_raw = sub[self.item_column].to_numpy()
        known = np.isin(i_raw, self.fit_items)
        q, i_raw = q[known], i_raw[known]
        i_pos = np.searchsorted(self.fit_items, i_raw)
        q_pos = np.searchsorted(query_ids, q)
        weights = self.idf[i_pos] if self.use_idf else np.ones(len(i_pos))
        vecs = np.zeros((len(query_ids), self.rank), dtype=np.float64)
        counts = np.zeros(len(query_ids), dtype=np.float64)
        np.add.at(vecs, q_pos, self.vectors[i_pos] * weights[:, None])
        np.add.at(counts, q_pos, 1.0)
        return (vecs / np.maximum(counts, 1.0)[:, None]).astype(np.float32)

    def _predict(self, dataset, k, queries, items, filter_seen_items=True):
        # ANN path (reference ANNMixin._predict_wrap contract) only when
        # scoring the full fitted catalog — subsets fall back to exact
        if self.ann_enabled and len(items) == len(self.fit_items):
            qv = self._query_vectors(queries, dataset)
            seen_lists = None
            if filter_seen_items and dataset is not None:
                inter = dataset.interactions
                grouped = inter.groupby(self.query_column)[self.item_column].agg(list)
                seen_lists = [grouped.get(q, []) for q in queries]
            return self._ann_predict(qv, queries, k, seen_lists)
        return super()._predict(dataset, k, queries, items, filter_seen_items)

    def _score_block(self, query_ids, item_ids, dataset=None) -> np.ndarray:
        if dataset is None:
            msg = "interactions are not provided, but required for prediction"
            raise ValueError(msg)
        qv = self._query_vectors(query_ids, dataset)
        iv = self.vectors[np.searchsorted(self.fit_items, item_ids)]
        return np.asarray(
            jnp.dot(jnp.asarray(qv), jnp.asarray(iv).T, preferred_element_type=jnp.float32)
        )

    def _get_item_vectors(self) -> np.ndarray:
        return self.vectors
