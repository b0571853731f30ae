from replay_tpu.nn.agg import PositionAwareAggregator
from replay_tpu.nn.sequential.bert4rec import Bert4Rec, Bert4RecBody, mask_token_id
from replay_tpu.nn.sequential.sasrec import (
    DiffTransformerBlock,
    DiffTransformerLayer,
    SasRec,
    SasRecBody,
    SasRecTransformerLayer,
)
from replay_tpu.nn.sequential.tisasrec import TiSasRec, TiSasRecLayer
from replay_tpu.nn.sequential.twotower import ItemTower, QueryTower, TwoTower, TwoTowerBody

__all__ = [
    "Bert4Rec",
    "Bert4RecBody",
    "mask_token_id",
    "DiffTransformerBlock",
    "DiffTransformerLayer",
    "PositionAwareAggregator",
    "SasRec",
    "SasRecBody",
    "SasRecTransformerLayer",
    "TiSasRec",
    "TiSasRecLayer",
    "ItemTower",
    "QueryTower",
    "TwoTower",
    "TwoTowerBody",
]
