"""Model registry: save/load any fitted model, splitter, or encoder by name.

TPU-native analog of the reference (reference:
replay/utils/model_handler.py:42 save, :85 load, :121 save_encoder,
:152 save_splitter).  Layout of a saved model directory:

    path/
      init_args.json          constructor args + _model_name
      dataframes/<name>.parquet
      arrays/<name>.npz       numpy state from model._get_save_state()
      state.pkl               other picklable save-state values
      model/                  model-specific extras (_save_model hook)

Classes are restored by name reflection over ``replay_tpu.models`` and
``replay_tpu.scenarios`` (or an explicit ``model_type``).
"""

import json
import pickle
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd


def save(model, path, overwrite: bool = False) -> None:
    """Save a fitted recommender to ``path`` (a directory)."""
    path = Path(path)
    if path.exists() and not overwrite:
        msg = f"Path '{path}' already exists. Mode is 'overwrite = False'."
        raise FileExistsError(msg)
    path.mkdir(parents=True, exist_ok=True)
    (path / "model").mkdir(exist_ok=True)
    model._save_model(str(path / "model"))

    init_args = dict(model._init_args)
    init_args["_model_name"] = str(model)
    (path / "init_args.json").write_text(json.dumps(init_args, default=str))

    df_dir = path / "dataframes"
    df_dir.mkdir(exist_ok=True)
    for name, frame in model._dataframes.items():
        if frame is not None:
            frame.to_parquet(df_dir / f"{name}.parquet")
    for attr in ("fit_queries", "fit_items"):
        if hasattr(model, attr):
            pd.DataFrame({attr: getattr(model, attr)}).to_parquet(df_dir / f"{attr}.parquet")

    arrays, other = {}, {}
    if hasattr(model, "_get_save_state"):
        for key, value in model._get_save_state().items():
            if isinstance(value, np.ndarray):
                arrays[key] = value
            elif value is not None:
                other[key] = value
    # common fitted array attributes persisted automatically
    for attr in ("query_factors", "item_factors", "vectors", "idf", "theta", "a_inv", "cluster_centers"):
        value = getattr(model, attr, None)
        if isinstance(value, np.ndarray):
            arrays[f"__attr__{attr}"] = value
    if arrays:
        np.savez_compressed(path / "arrays.npz", **arrays)
    if other:
        (path / "state.pkl").write_bytes(pickle.dumps(other))

    columns = {
        attr: getattr(model, attr)
        for attr in ("query_column", "item_column", "rating_column", "timestamp_column")
        if hasattr(model, attr)
    }
    (path / "columns.json").write_text(json.dumps(columns))

    # ANN round-trip: persist index PARAMS and rebuild on load (the
    # reference's init-meta contract, ann_mixin.py:194; before round 5 a
    # loaded ANN model silently degraded to the exact scoring path)
    index_builder = getattr(model, "index_builder", None)
    if index_builder is not None:
        import dataclasses

        (path / "ann_params.json").write_text(json.dumps({
            "index_param": {
                "class": type(index_builder).__name__,
                "init_args": dataclasses.asdict(index_builder),
            }
        }))


def load(path, model_type: Optional[type] = None):
    """Restore a model saved with :func:`save`."""
    import replay_tpu.experimental.models as experimental
    import replay_tpu.experimental.scenarios as experimental_scenarios
    import replay_tpu.models as models
    import replay_tpu.scenarios as scenarios

    path = Path(path)
    args = json.loads((path / "init_args.json").read_text())
    name = args.pop("_model_name")
    if model_type is not None:
        model_class = model_type
    elif name.startswith("Fallback_"):
        # composite: str(Fallback) embeds sub-model names; the sub-models
        # themselves are restored by Fallback._load_model
        model_class = scenarios.Fallback
    elif hasattr(models, name):
        model_class = getattr(models, name)
    elif hasattr(scenarios, name):
        model_class = getattr(scenarios, name)
    elif name in getattr(experimental, "__all__", ()):
        model_class = getattr(experimental, name)
    elif name in getattr(experimental_scenarios, "__all__", ()):
        model_class = getattr(experimental_scenarios, name)
    else:
        msg = f"Unknown model class {name}"
        raise ValueError(msg)
    model = model_class(**args)

    df_dir = path / "dataframes"
    if df_dir.exists():
        for frame_path in sorted(df_dir.glob("*.parquet")):
            frame = pd.read_parquet(frame_path)
            attr = frame_path.stem
            if attr in ("fit_queries", "fit_items"):
                setattr(model, attr, frame[attr].to_numpy())
            else:
                setattr(model, attr, frame)
    if hasattr(model, "fit_queries"):
        model._num_queries = len(model.fit_queries)
        model._query_dim_size = (
            int(model.fit_queries.max()) + 1 if len(model.fit_queries) else 0
        )
    if hasattr(model, "fit_items"):
        model._num_items = len(model.fit_items)
        model._item_dim_size = int(model.fit_items.max()) + 1 if len(model.fit_items) else 0

    state = {}
    arrays_path = path / "arrays.npz"
    if arrays_path.exists():
        with np.load(arrays_path, allow_pickle=False) as arrays:
            for key in arrays.files:
                if key.startswith("__attr__"):
                    setattr(model, key[len("__attr__") :], arrays[key])
                else:
                    state[key] = arrays[key]
    pkl = path / "state.pkl"
    if pkl.exists():
        state.update(pickle.loads(pkl.read_bytes()))
    if state and hasattr(model, "_set_save_state"):
        model._set_save_state(state)

    columns_path = path / "columns.json"
    if columns_path.exists():
        for attr, value in json.loads(columns_path.read_text()).items():
            setattr(model, attr, value)

    ann_path = path / "ann_params.json"
    if ann_path.exists() and hasattr(model, "init_builder_from_dict"):
        model.init_builder_from_dict(json.loads(ann_path.read_text()))
        # rebuild the index from the restored vectors/similarity (the index
        # itself is derived state — params + fitted arrays reproduce it)
        if type(model.index_builder).__name__ == "SparseSimParam" and hasattr(
            model, "_build_sparse_index"
        ):
            model._build_sparse_index()
        elif hasattr(model, "_build_ann_index"):
            model._build_ann_index()

    model._load_model(str(path / "model"))
    return model


def save_encoder(encoder, path) -> None:
    """Save a fitted LabelEncoder (reference: model_handler.py:121)."""
    encoder.save(str(path))


def load_encoder(path):
    from replay_tpu.preprocessing import LabelEncoder

    return LabelEncoder.load(str(path))


def save_splitter(splitter, path, overwrite: bool = False) -> None:
    """Save a splitter's init args (reference: model_handler.py:152)."""
    path = Path(path)
    if path.exists() and not overwrite:
        msg = f"Path '{path}' already exists. Mode is 'overwrite = False'."
        raise FileExistsError(msg)
    path.mkdir(parents=True, exist_ok=True)
    args = dict(splitter._init_args)
    args["_splitter_name"] = type(splitter).__name__
    (path / "init_args.json").write_text(json.dumps(args, default=str))


def load_splitter(path):
    import replay_tpu.splitters as splitters

    args = json.loads((Path(path) / "init_args.json").read_text())
    name = args.pop("_splitter_name")
    return getattr(splitters, name)(**args)
