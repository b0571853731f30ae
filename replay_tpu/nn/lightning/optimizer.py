"""Import-path compatibility: the reference's optimizer factory lives at
``replay.nn.lightning.optimizer`` (reference:
replay/nn/lightning/optimizer.py:24).  Canonical implementation:
:mod:`replay_tpu.nn.training` (optax-backed).
"""

from replay_tpu.nn.training import OptimizerFactory

__all__ = ["OptimizerFactory"]
