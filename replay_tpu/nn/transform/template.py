"""Import-path compatibility: the reference exposes canonical per-model
transform pipelines at ``replay.nn.transform.template`` (reference:
replay/nn/transform/template/{sasrec,twotower}.py:9).  Canonical
implementations: :mod:`replay_tpu.nn.templates`.
"""

from replay_tpu.nn.templates import (
    make_default_bert4rec_transforms,
    make_default_sasrec_transforms,
    make_default_twotower_transforms,
)

__all__ = [
    "make_default_bert4rec_transforms",
    "make_default_sasrec_transforms",
    "make_default_twotower_transforms",
]
