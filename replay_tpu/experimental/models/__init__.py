from typing import Any

from replay_tpu.experimental.models.admm_slim import ADMMSLIM
from replay_tpu.experimental.models.cql import CQL, DiscreteCQL, MdpDatasetBuilder
from replay_tpu.experimental.models.ddpg import DDPG
from replay_tpu.experimental.models.dt4rec import DT4Rec
from replay_tpu.experimental.models.hierarchical_recommender import HierarchicalRecommender
from replay_tpu.experimental.models.mult_vae import MultVAE
from replay_tpu.experimental.models.neural_ts import NeuralTS
from replay_tpu.experimental.models.neuromf import NeuroMF
from replay_tpu.experimental.models.u_lin_ucb import ULinUCB
from replay_tpu.models.als import ALSWrap as _ALSWrap
from replay_tpu.models.base_rec import Recommender as _Recommender

# Reference names subsumed by core classes (reference:
# replay/experimental/models/__init__.py): ScalaALSWrap is the reference's
# ALS + ANN combination — replay_tpu's ALSWrap already mixes in ANNMixin;
# TorchRecommender is the reference's torch-model base with a Spark
# inference loop — here neural experimental models build on the same
# blocked-device-scoring Recommender base as everything else.
ScalaALSWrap = _ALSWrap
TorchRecommender = _Recommender

__all__ = [
    "ScalaALSWrap",
    "TorchRecommender",
    "ADMMSLIM",
    "CQL",
    "DDPG",
    "DT4Rec",
    "DiscreteCQL",
    "MdpDatasetBuilder",
    "HierarchicalRecommender",
    "MultVAE",
    "NeuralTS",
    "NeuroMF",
    "ULinUCB",
]

# Wrappers over manually-installed C-extension libraries must be imported
# from their own modules (reference conditional-import contract:
# replay/experimental/models/__init__.py:34-50)
CONDITIONAL_IMPORTS = {
    "LightFMWrap": "replay_tpu.experimental.models.lightfm_wrap",
    "ImplicitWrap": "replay_tpu.experimental.models.implicit_wrap",
}


class ConditionalAccessError(Exception):
    """Raised when accessing conditional elements from the parent module
    instead of a direct import."""


def __getattr__(name: str) -> Any:
    if name in CONDITIONAL_IMPORTS:
        msg = (
            f"{name} relies on manual dependency installation and cannot be "
            f"accessed via higher-level modules. Import it directly from "
            f"{CONDITIONAL_IMPORTS[name]}"
        )
        raise ConditionalAccessError(msg)
    msg = f"module {__name__!r} has no attribute {name!r}"
    raise AttributeError(msg)
