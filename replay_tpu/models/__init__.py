"""Model zoo (reference: replay/models/)."""

from replay_tpu.models.base_rec import (
    BaseRecommender,
    HybridRecommender,
    NonPersonalizedRecommender,
    QueryRecommender,
    Recommender,
)
from replay_tpu.models.base_neighbour_rec import NeighbourRec
from replay_tpu.models.kl_ucb import KLUCB
from replay_tpu.models.knn import ItemKNN
from replay_tpu.models.pop_rec import PopRec
from replay_tpu.models.query_pop_rec import QueryPopRec
from replay_tpu.models.random_rec import RandomRec
from replay_tpu.models.thompson_sampling import ThompsonSampling
from replay_tpu.models.ucb import UCB
from replay_tpu.models.wilson import Wilson

__all__ = [
    "BaseRecommender",
    "HybridRecommender",
    "ItemKNN",
    "KLUCB",
    "NeighbourRec",
    "NonPersonalizedRecommender",
    "PopRec",
    "QueryPopRec",
    "QueryRecommender",
    "RandomRec",
    "Recommender",
    "ThompsonSampling",
    "UCB",
    "Wilson",
]
