from replay_tpu.nn.sequential.bert4rec import Bert4Rec, Bert4RecBody, mask_token_id
from replay_tpu.nn.sequential.sasrec import SasRec, SasRecBody, SasRecTransformerLayer
from replay_tpu.nn.sequential.tisasrec import TiSasRec, TiSasRecLayer
from replay_tpu.nn.sequential.twotower import ItemTower, TwoTower, TwoTowerBody

__all__ = [
    "Bert4Rec",
    "Bert4RecBody",
    "mask_token_id",
    "SasRec",
    "SasRecBody",
    "SasRecTransformerLayer",
    "TiSasRec",
    "TiSasRecLayer",
    "ItemTower",
    "TwoTower",
    "TwoTowerBody",
]
