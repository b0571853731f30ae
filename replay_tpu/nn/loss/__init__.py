"""Import-path compatibility: the reference exposes its loss zoo under
``replay.nn.loss`` (reference: replay/nn/loss/__init__.py:1).  The canonical
implementations live in :mod:`replay_tpu.nn.losses`; this subpackage re-exports
them under the reference's module path and names so existing imports resolve
unchanged (``from replay_tpu.nn.loss import CE, LogInCE`` etc.).
"""

from replay_tpu.nn.losses import (
    BCE,
    BCELoss,
    BCESampled,
    BCESampledLoss,
    BPRLoss,
    CE,
    CELoss,
    CESampled,
    CESampledLoss,
    CESampledWeighted,
    CESampledWeightedLoss,
    CEWeighted,
    CEWeightedLoss,
    LogInCE,
    LogInCELoss,
    LogInCESampled,
    LogInCESampledLoss,
    LogOutCE,
    LogOutCELoss,
    LogOutCESampled,
    LogOutCEWeighted,
    LogOutCEWeightedLoss,
    LossProto,
    SCE,
    SCEParams,
    ScalableCELoss,
    ScalableCrossEntropyLoss,
)
from replay_tpu.nn.tiled_ce import CELossTiled

__all__ = [
    "BCE",
    "BCELoss",
    "BCESampled",
    "BCESampledLoss",
    "BPRLoss",
    "CE",
    "CELoss",
    "CELossTiled",
    "CESampled",
    "CESampledLoss",
    "CESampledWeighted",
    "CESampledWeightedLoss",
    "CEWeighted",
    "CEWeightedLoss",
    "LogInCE",
    "LogInCELoss",
    "LogInCESampled",
    "LogInCESampledLoss",
    "LogOutCE",
    "LogOutCELoss",
    "LogOutCESampled",
    "LogOutCEWeighted",
    "LogOutCEWeightedLoss",
    "LossProto",
    "SCE",
    "SCEParams",
    "ScalableCELoss",
    "ScalableCrossEntropyLoss",
]
