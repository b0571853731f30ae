"""Training harness: optax train state + mesh-aware jitted steps.

Replaces the reference's PyTorch-Lightning wrapper (reference:
replay/nn/lightning/module.py:13, optimizer/scheduler factories
replay/nn/lightning/{optimizer,scheduler}.py:24,84).  Instead of a callback
bus around an eager loop, the whole step — batch transform, forward, loss,
backward, optimizer update — is ONE jitted function with explicit
shardings: batch over the ``data`` mesh axis, large embedding tables over
``model`` (replay_tpu/parallel/sharding.py).  XLA inserts the gradient
all-reduce; Lightning's ``sync_dist`` has no analog because there is
nothing to sync manually.

Determinism: dropout/sampling keys are `fold_in(root, step)` — counter
based, so resume-at-step reproduces the exact stream (SURVEY.md §7
multi-host determinism requirement).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.metrics.builder import MetricsBuilder
from replay_tpu.parallel import (
    batch_sharding,
    infer_param_shardings,
    make_mesh,
)


def _rbg_key(key):
    """Re-wrap a threefry key's bits as an XLA-rbg key.

    TPU dropout with the default threefry PRNG spends more time generating
    random bits than running the transformer (PERF.md, round 3); the rbg
    bit generator is ~4x cheaper and still counter-based, so deriving it
    from the per-step threefry stream keeps (seed, step) reproducibility.
    """
    data = jax.random.key_data(key).reshape(-1)
    return jax.random.wrap_key_data(jnp.tile(data, 2)[:4], impl="rbg")


class TrainState(train_state.TrainState):
    """Optax train state (params + opt state + step)."""


@dataclass
class OptimizerFactory:
    """Optimizer factory (reference: replay/nn/lightning/optimizer.py:24).

    ``algorithm`` ∈ {"adam", "adamw", "sgd"}; adamw is implied by a nonzero
    weight_decay with algorithm="adam".
    """

    learning_rate: float = 1e-3
    betas: tuple = (0.9, 0.98)
    weight_decay: float = 0.0
    clip_norm: Optional[float] = None
    algorithm: str = "adam"
    momentum: float = 0.0

    def create(self, schedule: Optional[Callable] = None) -> optax.GradientTransformation:
        lr = schedule if schedule is not None else self.learning_rate
        if self.algorithm == "sgd":
            opt = optax.sgd(lr, momentum=self.momentum or None)
        elif self.algorithm == "adamw" or self.weight_decay > 0:
            opt = optax.adamw(
                lr, b1=self.betas[0], b2=self.betas[1], weight_decay=self.weight_decay
            )
        elif self.algorithm == "adam":
            opt = optax.adam(lr, b1=self.betas[0], b2=self.betas[1])
        else:
            msg = f"Unknown optimizer algorithm {self.algorithm}"
            raise ValueError(msg)
        if self.clip_norm is not None:
            opt = optax.chain(optax.clip_by_global_norm(self.clip_norm), opt)
        return opt


@dataclass
class LRSchedulerFactory:
    """Warmup + decay schedules (reference: replay/nn/lightning/scheduler.py:84)."""

    warmup_steps: int = 0
    decay: str = "constant"  # constant | cosine | linear
    total_steps: int = 10000
    # reference LambdaLRSchedulerFactory (scheduler.py:105): an arbitrary
    # step -> multiplicative-factor callable applied to the base lr;
    # overrides the declarative decay fields when set
    schedule_fn: Optional[Callable] = None

    def create(self, base_lr: float) -> Callable:
        if self.schedule_fn is not None:
            fn = self.schedule_fn
            return lambda step: base_lr * fn(step)
        if self.decay == "cosine":
            return optax.warmup_cosine_decay_schedule(
                0.0, base_lr, self.warmup_steps, self.total_steps
            )
        if self.decay == "linear":
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, base_lr, max(self.warmup_steps, 1)),
                    optax.linear_schedule(base_lr, 0.0, max(self.total_steps - self.warmup_steps, 1)),
                ],
                [self.warmup_steps],
            )
        if self.warmup_steps:
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, base_lr, self.warmup_steps),
                    optax.constant_schedule(base_lr),
                ],
                [self.warmup_steps],
            )
        return optax.constant_schedule(base_lr)


@dataclass
class TrainerConfig:
    max_epochs: int = 1
    batch_size: int = 128
    max_sequence_length: int = 50
    seed: int = 0
    log_every: int = 100
    val_metrics: tuple = ("ndcg", "recall", "map")
    val_ks: tuple = (1, 5, 10)
    # >1 runs that many optimizer steps per device dispatch (lax.scan over a
    # host-stacked batch group): same math and RNG stream as dispatching one
    # step at a time, but host dispatch overhead amortizes K-fold — the
    # steps_per_loop idiom for TPU training loops
    steps_per_dispatch: int = 1
    # expand each query into overlapping training windows with this stride
    # (reference: replay/data/nn/torch_sequential_dataset.py:148
    # sliding_window_step); None = one tail window per query
    sliding_window_step: Optional[int] = None


class Trainer:
    """Fit/validate/predict driver for sequential flax models.

    :param model: flax module exposing ``forward_train(batch)`` →
        [B, L, D] hidden states, ``forward_inference(batch, candidates)`` →
        [B, N] logits, and a body with ``get_item_weights``.
    :param loss: callable from replay_tpu.nn.losses.
    :param transform: train-batch transform (e.g. NextTokenTransform),
        traced inside the jitted step.
    """

    def __init__(
        self,
        model,
        loss,
        optimizer: Optional[OptimizerFactory] = None,
        scheduler: Optional[LRSchedulerFactory] = None,
        transform: Optional[Callable] = None,
        config: Optional[TrainerConfig] = None,
        mesh=None,
        callbacks: Optional[List] = None,
        init_kwargs: Optional[Dict[str, Any]] = None,
    ):
        self.model = model
        self.loss = loss
        self.optimizer_factory = optimizer or OptimizerFactory()
        self.scheduler_factory = scheduler
        self.transform = transform
        self.config = config or TrainerConfig()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.callbacks = callbacks or []
        self.init_kwargs = init_kwargs or {}
        # non-trainable variable collections (e.g. TwoTower item-feature
        # "constants" buffers) captured at init and threaded into every apply
        self.extra_variables: Dict[str, Any] = {}
        self.state: Optional[TrainState] = None
        self.epoch: int = 0  # next epoch to run; persisted/restored via checkpoints
        self._train_step = None
        self._history: List[Dict[str, float]] = []

    # ------------------------------------------------------------------ init
    def init_state(self, example_batch: Dict[str, np.ndarray]) -> TrainState:
        schedule = (
            self.scheduler_factory.create(self.optimizer_factory.learning_rate)
            if self.scheduler_factory
            else None
        )
        tx = self.optimizer_factory.create(schedule)
        rng = jax.random.PRNGKey(self.config.seed)
        device_batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
        variables = self.model.init(
            {"params": rng, "dropout": rng}, device_batch, deterministic=True,
            **self.init_kwargs,
        )
        variables = dict(variables)
        params = variables.pop("params")
        self.extra_variables = variables  # e.g. {"constants": ...}
        shardings = infer_param_shardings(params, self.mesh)
        params = jax.device_put(params, shardings)
        state = TrainState.create(apply_fn=self.model.apply, params=params, tx=tx)
        # flax seeds step=0 (python int) and optax its scalar counts as
        # UNCOMMITTED single-device arrays; the first train step returns
        # them committed with mesh shardings — a DIFFERENT jit signature,
        # so every fit paid a full SECOND compile of the train step on its
        # second dispatch (measured 10-40 s through the remote-TPU
        # toolchain).  Commit all scalar counters replicated up front; the
        # optimizer moments already inherit the params' shardings.
        replicated = jax.NamedSharding(self.mesh, jax.sharding.PartitionSpec())

        def _commit_scalars(leaf):
            if isinstance(leaf, jnp.ndarray) and leaf.ndim == 0:
                return jax.device_put(leaf, replicated)
            return leaf

        self.state = state.replace(
            step=jax.device_put(jnp.asarray(0, jnp.int32), replicated),
            opt_state=jax.tree_util.tree_map(_commit_scalars, state.opt_state),
        )
        return self.state

    # ------------------------------------------------------------------ step
    def _make_step_fn(self):
        model = self.model
        loss_fn_outer = self.loss
        transform = self.transform
        extra = self.extra_variables

        def train_step(state: TrainState, batch, key):
            tkey, dkey, lkey = jax.random.split(key, 3)
            # dropout masks draw ~13M random bits per step; threefry costs
            # ~18 ms of a 50 ms SasRec step on TPU, the XLA rbg generator
            # ~5 ms (measured 81k -> 109k ex/s at batch 4096, PERF.md).
            # The rbg key is derived from the same counter-based stream so
            # runs stay reproducible per (seed, step).
            dkey = _rbg_key(dkey)
            if transform is not None:
                batch = transform(batch, key=tkey)
            labels = batch["labels"]
            mask = (
                batch.get("labels_padding_mask", batch["padding_mask"]).astype(jnp.float32)
                * batch["batch_mask"][:, None].astype(jnp.float32)
            )
            negatives = batch.get("negatives")

            def compute_loss(params):
                hidden = model.apply(
                    {"params": params, **extra},
                    batch,
                    deterministic=False,
                    rngs={"dropout": dkey},
                    method=type(model).forward_train
                    if hasattr(model, "forward_train")
                    else None,
                )
                item_w = model.apply(
                    {"params": params, **extra},
                    method=lambda m: m.body.get_item_weights(None),
                )
                kwargs = {"key": lkey}
                if negatives is not None:
                    kwargs["negatives"] = negatives
                if "sample_weights" in batch:
                    kwargs["sample_weights"] = batch["sample_weights"]
                return loss_fn_outer(hidden, labels, mask, item_w, **kwargs)

            loss_val, grads = jax.value_and_grad(compute_loss)(state.params)
            new_state = state.apply_gradients(grads=grads)
            return new_state, {"loss": loss_val}

        return train_step

    def _build_train_step(self):
        self._data_shard = batch_sharding(self.mesh)
        return jax.jit(self._make_step_fn(), donate_argnums=(0,))

    def _build_train_multistep(self):
        """K optimizer steps per dispatch: lax.scan over a [K, B, ...]
        stacked batch group.  Keys are fold_in(root, base_step + i), the
        SAME stream the one-step path consumes, so the two paths are
        interchangeable mid-run (leftover batches at an epoch tail go
        through the one-step jit)."""
        train_step = self._make_step_fn()

        def multi_step(state: TrainState, stacked, root_key, base_step):
            k_steps = jax.tree_util.tree_leaves(stacked)[0].shape[0]

            def body(st, inp):
                i, batch = inp
                st, stats = train_step(
                    st, batch, jax.random.fold_in(root_key, base_step + i)
                )
                return st, stats["loss"]

            state, losses = jax.lax.scan(
                body, state, (jnp.arange(k_steps), stacked)
            )
            return state, {"loss": losses}

        self._data_shard = batch_sharding(self.mesh)
        return jax.jit(multi_step, donate_argnums=(0,))

    def _place_stacked(self, group):
        """Host-stack a list of batches into [K, B, ...] arrays, sharding
        the BATCH (second) axis over the data mesh axis.  Multi-process:
        each host's group holds its ReplicasInfo shard rows — assemble the
        global stacked array from process-local data, mirroring
        ``_place_batch`` (review r4: the k_disp>1 path previously
        device_put LOCAL rows as if global)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked_shard = NamedSharding(self.mesh, P(None, "data"))
        replicated = NamedSharding(self.mesh, P())
        multiproc = jax.process_count() > 1
        local_in_axis = max(1, self.mesh.shape["data"] // jax.process_count())
        out = {}
        for k in group[0]:
            arr = np.stack([np.asarray(b[k]) for b in group])
            if multiproc:
                if arr.ndim >= 2 and arr.shape[1] % local_in_axis == 0:
                    out[k] = jax.make_array_from_process_local_data(
                        stacked_shard, arr
                    )
                else:
                    out[k] = jax.device_put(arr, replicated)
            elif arr.ndim >= 2 and arr.shape[1] % self.mesh.shape["data"] == 0:
                out[k] = jax.device_put(jnp.asarray(arr), stacked_shard)
            else:
                out[k] = jnp.asarray(arr)
        return out

    def _place_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if jax.process_count() > 1:
            # multi-process: this host's batch is its ReplicasInfo shard of
            # the global batch — assemble without cross-host copies
            from replay_tpu.parallel.multihost import place_local_batch

            return place_local_batch(batch, self.mesh)
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            if arr.ndim >= 1 and arr.shape[0] % self.mesh.shape["data"] == 0:
                out[k] = jax.device_put(arr, self._data_shard)
            else:
                out[k] = arr
        return out

    # -------------------------------------------------------------- restore
    def restore(self, checkpoint_dir: str, example_batch: Dict[str, np.ndarray], step=None):
        """Resume from an orbax checkpoint (replay_tpu.nn.checkpoint).

        Rebuilds the state template from ``example_batch`` then loads the
        saved params/opt-state/step AND the epoch counter (from the
        checkpoint's extra payload): a subsequent ``fit`` continues the
        epoch loop — and therefore the (seed, epoch) shuffle stream — where
        it left off, while the counter-based dropout/sampling key stream
        continues from the restored step, so the resumed run matches an
        uninterrupted one.
        """
        from replay_tpu.nn.checkpoint import CheckpointManager

        if self.state is None:
            self.init_state(example_batch)
        manager = CheckpointManager(checkpoint_dir)
        template = self.state
        restored = manager.restore(template, step=step)
        extra = manager.load_extra(step=step)
        if extra is not None and "epoch" in extra:
            # extra["epoch"] records the last COMPLETED epoch
            self.epoch = int(float(extra["epoch"])) + 1
        # orbax restores single-device committed arrays; re-place every leaf
        # on the mesh (params by the sharding rules, the rest replicated) so
        # the jitted step sees one consistent device set
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.mesh, P())
        params = jax.device_put(
            restored.params, infer_param_shardings(restored.params, self.mesh)
        )
        rest = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, replicated), restored.opt_state
        )
        self.state = restored.replace(
            params=params,
            opt_state=rest,
            step=jax.device_put(restored.step, replicated),
        )
        self._train_step = self._build_train_step()
        return self.state

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        train_dataset: SequentialDataset,
        val_dataset: Union[SequentialDataset, Dict[str, SequentialDataset], None] = None,
    ) -> List[Dict[str, float]]:
        """Train; ``val_dataset`` may be a single dataset or a dict of named
        datasets (the reference ParquetModule's multiple-validation-paths
        CombinedLoader, reference: parquet_module.py:149-202) — metrics from
        named sets are prefixed ``{name}/``."""
        cfg = self.config
        root_key = jax.random.PRNGKey(cfg.seed)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        k_disp = max(1, cfg.steps_per_dispatch)
        multi_step = self._build_train_multistep() if k_disp > 1 else None
        step_no = int(self.state.step) if self.state is not None else 0
        ran_any = False
        for epoch in range(self.epoch, cfg.max_epochs):
            ran_any = True
            epoch_losses = []
            group: List[Dict[str, np.ndarray]] = []
            # transforms that shorten sequences (NextTokenTransform's shift)
            # declare extra_length so model inputs stay max_sequence_length
            extra = getattr(self.transform, "extra_length", 0)
            for batch in train_dataset.batches(
                batch_size=cfg.batch_size,
                max_sequence_length=cfg.max_sequence_length + extra,
                shuffle=True,
                seed=cfg.seed,
                epoch=epoch,
                sliding_window_step=cfg.sliding_window_step,
            ):
                if self.state is None:
                    self.init_state(batch)
                    self._train_step = self._build_train_step()
                if k_disp > 1:
                    group.append(batch)
                    if len(group) == k_disp:
                        self.state, stats = multi_step(
                            self.state, self._place_stacked(group),
                            root_key, step_no,
                        )
                        epoch_losses.extend(stats["loss"])
                        step_no += k_disp
                        group = []
                    continue
                device_batch = self._place_batch(batch)
                key = jax.random.fold_in(root_key, step_no)
                self.state, stats = self._train_step(self.state, device_batch, key)
                epoch_losses.append(stats["loss"])
                step_no += 1
            # epoch-tail leftovers smaller than a dispatch group run one-step
            for batch in group:
                device_batch = self._place_batch(batch)
                key = jax.random.fold_in(root_key, step_no)
                self.state, stats = self._train_step(self.state, device_batch, key)
                epoch_losses.append(stats["loss"])
                step_no += 1
            record: Dict[str, float] = {
                "epoch": epoch,
                "loss": float(jnp.mean(jnp.stack(epoch_losses))) if epoch_losses else float("nan"),
            }
            if val_dataset is not None:
                if isinstance(val_dataset, dict):
                    for name, ds in val_dataset.items():
                        record.update(
                            {
                                f"{name}/{k}": v
                                for k, v in self.validate(train_dataset, ds).items()
                            }
                        )
                else:
                    record.update(self.validate(train_dataset, val_dataset))
            for cb in self.callbacks:
                cb(self, record)
            self._history.append(record)
            self.epoch = epoch + 1
        if ran_any:
            # a COMPLETED run resets the epoch cursor so a subsequent fit()
            # trains again (the cursor only persists across restore-resume
            # and across a no-op fit at an already-reached max_epochs)
            self.epoch = 0
        return self._history

    def fit_loader(
        self,
        module,
        max_epochs: Optional[int] = None,
        val_dataset: Union[SequentialDataset, Dict[str, SequentialDataset], None] = None,
        val_history: Optional[SequentialDataset] = None,
    ) -> List[Dict[str, float]]:
        """Fit from a streaming ParquetModule (replay_tpu.data.nn.parquet).

        The module's batches must carry the model's expected field names
        (use RenameTransform — e.g. ``{"item_id_mask": "padding_mask"}`` —
        as the module's train transform, composed before the Trainer's own
        transform).

        Resumes the step counter from ``state.step`` (same counter-based RNG
        contract as ``fit``) and the epoch loop from the restored epoch.
        ``val_dataset`` enables per-epoch validation exactly as in ``fit``;
        ``val_history`` supplies the query histories to run inference from
        (required with ``val_dataset``, since the streaming module does not
        expose an in-memory SequentialDataset).
        """
        cfg = self.config
        root_key = jax.random.PRNGKey(cfg.seed)
        epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        if val_dataset is not None and val_history is None:
            msg = "fit_loader validation needs val_history (the query histories)"
            raise ValueError(msg)
        step_no = int(self.state.step) if self.state is not None else 0
        k_disp = max(1, cfg.steps_per_dispatch)
        multi_step = self._build_train_multistep() if k_disp > 1 else None
        ran_any = False
        for epoch in range(self.epoch, epochs):
            ran_any = True
            epoch_losses = []
            group: List[Dict[str, np.ndarray]] = []
            pre = module.transform_for("train")
            for batch in module.loader("train", epoch):
                if pre is not None:
                    batch = pre(batch)
                if self.state is None:
                    self.init_state(batch)
                    self._train_step = self._build_train_step()
                if k_disp > 1:
                    group.append(batch)
                    if len(group) == k_disp:
                        self.state, stats = multi_step(
                            self.state, self._place_stacked(group),
                            root_key, step_no,
                        )
                        epoch_losses.extend(stats["loss"])
                        step_no += k_disp
                        group = []
                    continue
                device_batch = self._place_batch(batch)
                key = jax.random.fold_in(root_key, step_no)
                self.state, stats = self._train_step(self.state, device_batch, key)
                epoch_losses.append(stats["loss"])
                step_no += 1
            for batch in group:  # stream-tail leftovers: one-step path
                device_batch = self._place_batch(batch)
                key = jax.random.fold_in(root_key, step_no)
                self.state, stats = self._train_step(self.state, device_batch, key)
                epoch_losses.append(stats["loss"])
                step_no += 1
            record: Dict[str, float] = {
                "epoch": epoch,
                "loss": float(jnp.mean(jnp.stack(epoch_losses))) if epoch_losses else float("nan"),
            }
            if val_dataset is not None:
                if isinstance(val_dataset, dict):
                    for name, ds in val_dataset.items():
                        record.update(
                            {
                                f"{name}/{k}": v
                                for k, v in self.validate(val_history, ds).items()
                            }
                        )
                else:
                    record.update(self.validate(val_history, val_dataset))
            for cb in self.callbacks:
                cb(self, record)
            self._history.append(record)
            self.epoch = epoch + 1
        if ran_any:
            self.epoch = 0  # completed run: next fit_loader trains again
        return self._history

    # -------------------------------------------------------------- validate
    def validate(
        self,
        train_dataset: SequentialDataset,
        val_dataset: SequentialDataset,
        ks: Optional[tuple] = None,
    ) -> Dict[str, float]:
        """Next-item validation: history from ``train_dataset``, targets =
        ``val_dataset`` sequences (reference ValidationMetricsCallback
        semantics, replay/models/nn/sequential/callbacks/validation_callback.py:37)."""
        cfg = self.config
        ks = ks or cfg.val_ks
        builder = MetricsBuilder(metrics=cfg.val_metrics, ks=ks)
        max_k = builder.max_k
        infer = self._make_infer_fn()

        val_ids = val_dataset.query_ids
        item_name = train_dataset.schema.item_id_feature_name
        history = train_dataset.filter_by_query_id(val_ids)
        max_gt = max(val_dataset.max_len, 1)

        for batch in history.batches(
            batch_size=cfg.batch_size,
            max_sequence_length=cfg.max_sequence_length,
            shuffle=False,
        ):
            logits = infer(self.state.params, self._place_batch(batch))
            # mask FULL histories to -inf (reference SeenItemsFilter filters
            # every seen item, not just the model's cropped window)
            logits = _mask_seen(logits, history, batch["query_id"], item_name)
            _, top_idx = jax.lax.top_k(logits, max_k)
            gt = _gather_ground_truth(val_dataset, batch["query_id"], item_name, max_gt)
            builder.add_prediction(
                top_idx, gt, train=jnp.asarray(batch[item_name]), row_mask=batch["batch_mask"]
            )
        return builder.get_metrics()

    def _make_infer_fn(self):
        # cached on the instance: a fresh jit closure per call would
        # re-trace AND re-compile on every predict_topk/evaluate invocation
        # (the round-5 AOT-serving finding — 40 s per call through a
        # remote-compile tunnel)
        cached = getattr(self, "_infer_fn", None)
        if cached is not None:
            return cached
        model = self.model
        extra = self.extra_variables

        def infer(params, batch):
            return model.apply(
                {"params": params, **extra},
                batch,
                method=type(model).forward_inference,
            )

        self._infer_fn = jax.jit(infer)
        return self._infer_fn

    def predict_candidates(
        self,
        dataset: SequentialDataset,
        candidates,
    ):
        """Scores for an explicit candidate-item subset per query — the
        reference's ``candidates_to_score`` path (reference:
        replay/nn/lightning/module.py candidates injection).

        :returns: (query_ids [N], scores [N, n_candidates]).
        """
        cfg = self.config
        model = self.model
        extra = self.extra_variables
        cand = jnp.asarray(np.asarray(candidates))

        # cached per instance: candidates ride as a traced ARGUMENT so one
        # compiled executable serves every candidate set of the same length
        # (a fresh jit closure per call would recompile each invocation —
        # the round-5 AOT-serving finding)
        cached = getattr(self, "_candidates_fn", None)
        if cached is None:

            def infer(params, batch, cand_arg):
                return model.apply(
                    {"params": params, **extra},
                    batch,
                    cand_arg,
                    method=type(model).forward_inference,
                )

            cached = self._candidates_fn = jax.jit(infer)
        infer = partial(cached, cand_arg=cand)

        all_ids, all_scores = [], []
        for batch in dataset.batches(
            batch_size=cfg.batch_size,
            max_sequence_length=cfg.max_sequence_length,
            shuffle=False,
        ):
            scores = infer(self.state.params, self._place_batch(batch))
            real = np.asarray(batch["batch_mask"]).astype(bool)
            all_ids.append(np.asarray(batch["query_id"])[real])
            all_scores.append(np.asarray(scores)[real])
        return np.concatenate(all_ids), np.concatenate(all_scores)

    # --------------------------------------------------------------- predict
    def predict_topk(
        self,
        dataset: SequentialDataset,
        k: int,
        filter_seen: bool = True,
    ):
        """Top-k recommendations for every query → (query_ids, item ids [N,k], scores)."""
        cfg = self.config
        infer = self._make_infer_fn()
        item_name = dataset.schema.item_id_feature_name
        all_ids, all_items, all_scores = [], [], []
        for batch in dataset.batches(
            batch_size=cfg.batch_size,
            max_sequence_length=cfg.max_sequence_length,
            shuffle=False,
        ):
            logits = infer(self.state.params, self._place_batch(batch))
            if filter_seen:
                logits = _mask_seen(logits, dataset, batch["query_id"], item_name)
            vals, idx = jax.lax.top_k(logits, k)
            real = np.asarray(batch["batch_mask"]).astype(bool)
            all_ids.append(np.asarray(batch["query_id"])[real])
            all_items.append(np.asarray(idx)[real])
            all_scores.append(np.asarray(vals)[real])
        return (
            np.concatenate(all_ids),
            np.concatenate(all_items),
            np.concatenate(all_scores),
        )


def _mask_seen(
    logits: jnp.ndarray, dataset: SequentialDataset, query_ids, item_name: str
) -> jnp.ndarray:
    """-inf the items each query has EVER interacted with (full history,
    reference filter-seen semantics, replay/models/base_rec.py:152-201).

    Scatters padded seen-id lists [B, max_seen] on device instead of building
    a dense [B, n_items] bool matrix on host — O(B·max_seen) instead of
    O(B·N) memory, with out-of-range padding ids dropped by the scatter."""
    n_items = logits.shape[-1]
    seen, _ = dataset.padded_sequences(query_ids, item_name, pad_value=n_items)
    rows = jnp.arange(logits.shape[0])[:, None]
    return logits.at[rows, jnp.asarray(seen, dtype=jnp.int32)].set(
        -jnp.inf, mode="drop"
    )


def _gather_ground_truth(dataset: SequentialDataset, query_ids, item_name, max_gt):
    out, _ = dataset.padded_sequences(query_ids, item_name, length=max_gt, pad_value=-1)
    return jnp.asarray(out.astype(np.int64))


# Reference names (replay/models/nn/optimizer_utils.py FatOptimizerFactory /
# FatLRSchedulerFactory) — same factories, the upstream spelling.
FatOptimizerFactory = OptimizerFactory
FatLRSchedulerFactory = LRSchedulerFactory
