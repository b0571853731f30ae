from replay_tpu.experimental.models.admm_slim import ADMMSLIM
from replay_tpu.experimental.models.cql import CQL
from replay_tpu.experimental.models.ddpg import DDPG
from replay_tpu.experimental.models.dt4rec import DT4Rec
from replay_tpu.experimental.models.hierarchical_recommender import HierarchicalRecommender
from replay_tpu.experimental.models.mult_vae import MultVAE
from replay_tpu.experimental.models.neuromf import NeuroMF
from replay_tpu.experimental.models.u_lin_ucb import ULinUCB

__all__ = [
    "ADMMSLIM",
    "CQL",
    "DDPG",
    "DT4Rec",
    "HierarchicalRecommender",
    "MultVAE",
    "NeuroMF",
    "ULinUCB",
]
