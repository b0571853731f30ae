"""Model zoo (reference: replay/models/)."""

from replay_tpu.models.base_rec import (
    BaseRecommender,
    HybridRecommender,
    ItemVectorModel,
    NonPersonalizedRecommender,
    QueryRecommender,
    Recommender,
)
from replay_tpu.models.als import ALSWrap
from replay_tpu.models.association_rules import AssociationRulesItemRec
from replay_tpu.models.base_neighbour_rec import NeighbourRec
from replay_tpu.models.cat_pop_rec import CatPopRec
from replay_tpu.models.cluster import ClusterRec
from replay_tpu.models.kl_ucb import KLUCB
from replay_tpu.models.lin_ucb import LinUCB
from replay_tpu.models.knn import ItemKNN
from replay_tpu.models.pop_rec import PopRec
from replay_tpu.models.query_pop_rec import QueryPopRec
from replay_tpu.models.random_rec import RandomRec
from replay_tpu.models.slim import SLIM
from replay_tpu.models.thompson_sampling import ThompsonSampling
from replay_tpu.models.ucb import UCB
from replay_tpu.models.wilson import Wilson
from replay_tpu.models.word2vec import Word2VecRec

__all__ = [
    "ALSWrap",
    "AssociationRulesItemRec",
    "BaseRecommender",
    "CatPopRec",
    "ClusterRec",
    "HybridRecommender",
    "ItemKNN",
    "ItemVectorModel",
    "KLUCB",
    "LinUCB",
    "NeighbourRec",
    "NonPersonalizedRecommender",
    "PopRec",
    "QueryPopRec",
    "QueryRecommender",
    "RandomRec",
    "Recommender",
    "SLIM",
    "ThompsonSampling",
    "UCB",
    "Wilson",
    "Word2VecRec",
]
