"""Import-path compatibility: the reference's old-stack optimizer factories
live at ``replay.models.nn.optimizer_utils`` (reference:
replay/models/nn/optimizer_utils/optimizer_factory.py:51,93).  Canonical
implementations: :mod:`replay_tpu.nn.training` (optax-backed).

The reference's ``Fat*`` variants are the same factories with extra fields
pre-populated; here both names bind to the single optax factory pair.
"""

from replay_tpu.nn.training import LRSchedulerFactory, OptimizerFactory
from replay_tpu.utils.types import TORCH_AVAILABLE

FatOptimizerFactory = OptimizerFactory
FatLRSchedulerFactory = LRSchedulerFactory

__all__ = [
    "FatLRSchedulerFactory",
    "FatOptimizerFactory",
    "LRSchedulerFactory",
    "OptimizerFactory",
    "TORCH_AVAILABLE",
]
