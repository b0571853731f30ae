"""Import-path compatibility: the reference exposes the bucketed scalable
cross-entropy at ``replay.models.nn.loss`` (reference:
replay/models/nn/loss/sce.py:27).  Canonical implementation:
:mod:`replay_tpu.nn.losses`.
"""

from replay_tpu.nn.losses import SCEParams, ScalableCELoss, ScalableCrossEntropyLoss

__all__ = ["SCEParams", "ScalableCELoss", "ScalableCrossEntropyLoss"]
