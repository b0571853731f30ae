"""Import-path compatibility: the reference wraps its torch models in a
generic ``LightningModule`` under ``replay.nn.lightning`` (reference:
replay/nn/lightning/module.py:13) and drives it with ``lightning.Trainer``.

replay_tpu fuses those two roles: :class:`replay_tpu.nn.training.Trainer`
bundles (model, loss, optimizer/scheduler factories, transforms, callbacks)
AND runs the jitted train/eval loop itself — there is no external trainer to
hand a module to.  ``LightningModule`` is therefore an alias of ``Trainer``:
construct it with the same ingredients the reference module takes, then call
``.fit(...)`` directly.
"""

from replay_tpu.nn.training import (
    LRSchedulerFactory,
    OptimizerFactory,
    Trainer,
    TrainerConfig,
)

LightningModule = Trainer

__all__ = [
    "LRSchedulerFactory",
    "LightningModule",
    "OptimizerFactory",
    "Trainer",
    "TrainerConfig",
]
