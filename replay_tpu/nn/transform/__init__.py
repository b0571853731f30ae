"""Import-path compatibility: the reference exposes batch transforms under
``replay.nn.transform`` (reference: replay/nn/transform/__init__.py:1).  The
canonical implementations live in :mod:`replay_tpu.nn.transforms`; re-exported
here so reference users' imports resolve unchanged.
"""

from replay_tpu.nn.transforms import (
    AdaptiveTrimTransform,
    Compose,
    CopyTransform,
    EqualityMaskTransform,
    GroupTransform,
    MaskedLMTransform,
    MultiClassNegativeSamplingTransform,
    NextTokenTransform,
    RenameTransform,
    SelectTransform,
    SequenceRollTransform,
    TokenMaskTransform,
    TrimTransform,
    UniformNegativeSamplingTransform,
    UnsqueezeTransform,
)

__all__ = [
    "AdaptiveTrimTransform",
    "Compose",
    "CopyTransform",
    "EqualityMaskTransform",
    "GroupTransform",
    "MaskedLMTransform",
    "MultiClassNegativeSamplingTransform",
    "NextTokenTransform",
    "RenameTransform",
    "SelectTransform",
    "SequenceRollTransform",
    "TokenMaskTransform",
    "TrimTransform",
    "UniformNegativeSamplingTransform",
    "UnsqueezeTransform",
]
