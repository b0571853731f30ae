"""Import-path compatibility: the reference's CPU-compiled inference models
live at ``replay.models.nn.sequential.compiled`` (reference:
replay/models/nn/sequential/compiled/{base_compiled_model,sasrec_compiled,
bert4rec_compiled}.py).  Canonical implementations:
:mod:`replay_tpu.nn.compiled` (StableHLO AOT export instead of OpenVINO).

``OPENVINO_AVAILABLE`` gates the reference's compiled classes on the
openvino import; the StableHLO path ships with jax itself, so the analogous
"compiled inference available" flag is unconditionally True.
"""

from replay_tpu.nn.compiled import (
    Bert4RecCompiled,
    CompiledSequentialModel,
    SasRecCompiled,
)

OPENVINO_AVAILABLE = True

__all__ = [
    "Bert4RecCompiled",
    "CompiledSequentialModel",
    "OPENVINO_AVAILABLE",
    "SasRecCompiled",
]
