"""Experimental model/indexer persistence (reference:
replay/experimental/utils/model_handler.py:123 save_indexer, :155
load_indexer; model save/load delegates to the shared registry)."""

import json
from pathlib import Path

import numpy as np

from replay_tpu.experimental.preprocessing.indexer import Indexer
from replay_tpu.utils.model_handler import load, save  # noqa: F401  (re-export)


def save_indexer(indexer: Indexer, path, overwrite: bool = False) -> None:
    """Save a fitted Indexer to ``path`` (a directory)."""
    path = Path(path)
    if path.exists() and not overwrite:
        msg = f"Path '{path}' already exists. Mode is 'overwrite = False'."
        raise FileExistsError(msg)
    path.mkdir(parents=True, exist_ok=True)
    args = dict(indexer._init_args)
    args["user_type"] = str(indexer.user_type)
    args["item_type"] = str(indexer.item_type)
    (path / "init_args.json").write_text(json.dumps(args))
    np.save(path / "user_labels.npy", indexer.user_labels, allow_pickle=True)
    np.save(path / "item_labels.npy", indexer.item_labels, allow_pickle=True)


def load_indexer(path) -> Indexer:
    """Restore an Indexer saved with :func:`save_indexer`."""
    path = Path(path)
    args = json.loads((path / "init_args.json").read_text())
    user_type = args.pop("user_type")
    item_type = args.pop("item_type")
    indexer = Indexer(**args)
    indexer.user_labels = np.load(path / "user_labels.npy", allow_pickle=True)
    indexer.item_labels = np.load(path / "item_labels.npy", allow_pickle=True)
    indexer.user_type = np.dtype(user_type) if user_type != "None" else None
    indexer.item_type = np.dtype(item_type) if item_type != "None" else None
    return indexer
