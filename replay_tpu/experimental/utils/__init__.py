"""Experimental-tier utilities (reference: replay/experimental/utils/).

The reference duplicates a full model_handler/session/logger stack for its
legacy tier; here the main registry already serves experimental models
(replay_tpu/utils/model_handler.py name reflection), so this package adds
only the genuinely experimental pieces — Indexer persistence — and
re-exports the shared save/load."""

from replay_tpu.experimental.utils.model_handler import (
    load,
    load_indexer,
    save,
    save_indexer,
)

__all__ = ["load", "load_indexer", "save", "save_indexer"]
