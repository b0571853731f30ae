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

__all__ = [
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
