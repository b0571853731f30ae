"""Checkpointing for the NN trainer (orbax-backed).

TPU-native analog of Lightning's ModelCheckpoint + the reference's
save_hyperparameters (reference: replay/nn/lightning/module.py:36; registry
mechanisms replay/utils/model_handler.py:42-118).  Saves the full
TrainState (params + optimizer state + step) plus the trainer config, and
restores to resume training exactly — the step counter drives the
counter-based RNG so the post-resume batch/dropout streams match an
uninterrupted run.
"""

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Save/restore Trainer state; keeps the ``max_to_keep`` newest steps."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state, extra: Optional[Dict[str, Any]] = None) -> None:
        payload = {"state": state}
        self._manager.save(step, args=ocp.args.StandardSave(payload))
        self._manager.wait_until_finished()
        if extra is not None:
            (self.directory / f"extra_{step}.json").write_text(json.dumps(extra, default=str))

    @property
    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.latest_step
        if step is None:
            msg = f"No checkpoints in {self.directory}"
            raise FileNotFoundError(msg)
        restored = self._manager.restore(
            step, args=ocp.args.StandardRestore({"state": state_template})
        )
        return restored["state"]

    def load_extra(self, step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        step = step if step is not None else self.latest_step
        path = self.directory / f"extra_{step}.json"
        return json.loads(path.read_text()) if path.exists() else None


class CheckpointCallback:
    """Trainer epoch callback: saves every ``every_n_epochs``, optionally
    tracking the best metric (ModelCheckpoint monitor semantics)."""

    def __init__(
        self,
        directory: str,
        every_n_epochs: int = 1,
        monitor: Optional[str] = None,
        mode: str = "max",
        max_to_keep: int = 3,
    ):
        self.manager = CheckpointManager(directory, max_to_keep=max_to_keep)
        self.every_n_epochs = every_n_epochs
        self.monitor = monitor
        self.mode = mode
        self.best: Optional[float] = None

    def __call__(self, trainer, record: Dict[str, float]) -> None:
        epoch = int(record.get("epoch", 0))
        if (epoch + 1) % self.every_n_epochs:
            return
        if self.monitor is not None:
            value = record.get(self.monitor)
            if value is None:
                return
            better = (
                self.best is None
                or (self.mode == "max" and value > self.best)
                or (self.mode == "min" and value < self.best)
            )
            if not better:
                return
            self.best = float(value)
        self.manager.save(
            int(trainer.state.step),
            trainer.state,
            extra={k: float(v) for k, v in record.items()},
        )
