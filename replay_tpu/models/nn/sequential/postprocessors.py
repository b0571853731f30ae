"""Import-path compatibility: the reference's logit postprocessors live at
``replay.models.nn.sequential.postprocessors`` (reference:
replay/models/nn/sequential/postprocessors/postprocessors.py:14,114).
Canonical implementations: :mod:`replay_tpu.nn.callbacks`.
"""

from replay_tpu.nn.callbacks import BasePostProcessor, SampleItems, SeenItemsFilter
from replay_tpu.utils.types import TORCH_AVAILABLE

RemoveSeenItems = SeenItemsFilter

__all__ = ["BasePostProcessor", "RemoveSeenItems", "SampleItems", "TORCH_AVAILABLE"]
