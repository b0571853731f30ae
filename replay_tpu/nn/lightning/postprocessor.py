"""Import-path compatibility: the reference exposes logit postprocessors at
``replay.nn.lightning.postprocessor`` (reference:
replay/nn/lightning/postprocessor/seen_items.py:8).  Canonical
implementations: :mod:`replay_tpu.nn.callbacks`.
"""

from replay_tpu.nn.callbacks import BasePostProcessor, SampleItems, SeenItemsFilter

PostprocessorBase = BasePostProcessor

__all__ = ["PostprocessorBase", "SampleItems", "SeenItemsFilter"]
