"""Composable neural building blocks (TPU-native analog of reference replay/nn/).

Blocks are flax.linen modules with a uniform dtype policy: parameters live in
float32, activations compute in bfloat16 by default (MXU-native), logits and
losses accumulate in float32.
"""

from replay_tpu.nn.embedding import (
    CategoricalEmbedding,
    NumericalEmbedding,
    SequenceEmbedding,
)
from replay_tpu.utils.types import TORCH_AVAILABLE
from replay_tpu.nn.ffn import PointWiseFeedForward, SwiGLU
from replay_tpu.nn.attention import MultiHeadSelfAttention
from replay_tpu.nn.head import EmbeddingTyingHead
from replay_tpu.nn.output import InferenceOutput, TrainOutput
from replay_tpu.nn.tiled_ce import CELossTiled
from replay_tpu.nn.losses import (
    BCELoss,
    BPRLoss,
    BCESampledLoss,
    CELoss,
    CESampledLoss,
    CESampledWeightedLoss,
    CEWeightedLoss,
    LogInCELoss,
    LogOutCELoss,
    ScalableCELoss,
)
from replay_tpu.nn.transforms import (
    Compose,
    AdaptiveTrimTransform,
    EqualityMaskTransform,
    GroupTransform,
    MaskedLMTransform,
    MultiClassNegativeSamplingTransform,
    RenameTransform,
    UnsqueezeTransform,
    NextTokenTransform,
    SequenceRollTransform,
    TokenMaskTransform,
    TrimTransform,
    UniformNegativeSamplingTransform,
)

__all__ = [
    "TORCH_AVAILABLE",
    "CategoricalEmbedding",
    "NumericalEmbedding",
    "SequenceEmbedding",
    "PointWiseFeedForward",
    "SwiGLU",
    "MultiHeadSelfAttention",
    "EmbeddingTyingHead",
    "InferenceOutput",
    "TrainOutput",
    "BCELoss",
    "BPRLoss",
    "BCESampledLoss",
    "CELoss",
    "CELossTiled",
    "CESampledLoss",
    "CESampledWeightedLoss",
    "CEWeightedLoss",
    "LogInCELoss",
    "LogOutCELoss",
    "ScalableCELoss",
    "Compose",
    "AdaptiveTrimTransform",
    "EqualityMaskTransform",
    "GroupTransform",
    "MultiClassNegativeSamplingTransform",
    "MaskedLMTransform",
    "RenameTransform",
    "UnsqueezeTransform",
    "NextTokenTransform",
    "SequenceRollTransform",
    "TokenMaskTransform",
    "TrimTransform",
    "UniformNegativeSamplingTransform",
]
