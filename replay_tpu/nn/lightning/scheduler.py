"""Import-path compatibility: the reference's LR-scheduler factories live at
``replay.nn.lightning.scheduler`` (reference:
replay/nn/lightning/scheduler.py:84,105).  Canonical implementation:
:mod:`replay_tpu.nn.training`; ``LambdaLRSchedulerFactory`` is the same
factory — it already takes an arbitrary schedule callable.
"""

from replay_tpu.nn.training import LRSchedulerFactory

LambdaLRSchedulerFactory = LRSchedulerFactory

__all__ = ["LRSchedulerFactory", "LambdaLRSchedulerFactory"]
