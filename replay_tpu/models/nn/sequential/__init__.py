"""Import-path compatibility: the reference's old-stack sequential models
live under ``replay.models.nn.sequential`` (reference:
replay/models/nn/sequential/__init__.py:1).  Canonical implementations:
:mod:`replay_tpu.nn.sequential`.
"""

from replay_tpu.nn.sequential import Bert4Rec, SasRec, TiSasRec
from replay_tpu.utils.types import TORCH_AVAILABLE

__all__ = ["Bert4Rec", "SasRec", "TORCH_AVAILABLE", "TiSasRec"]
