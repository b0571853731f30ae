"""Alias package: the reference exposes its neural recommenders under
``replay.models.nn`` (reference: replay/models/nn/__init__.py:1), while this
framework's canonical home is :mod:`replay_tpu.nn.sequential`.  Re-export so
reference users' imports resolve unchanged.
"""

from replay_tpu.nn.sequential import Bert4Rec, SasRec, TiSasRec, TwoTower

__all__ = ["Bert4Rec", "SasRec", "TiSasRec", "TwoTower"]
