"""AOT-compiled inference models (serialized StableHLO).

TPU-native analog of the reference's OpenVINO compilation path (reference:
replay/models/nn/sequential/compiled/base_compiled_model.py:19,54 and
{sasrec,bert4rec}_compiled.py:20 — Lightning ckpt → ONNX → OpenVINO).
Here the export pipeline is jax.export: the model's ``forward_inference``
is traced at a fixed (or symbolically-dynamic) batch shape, lowered to
StableHLO, and serialized to a portable artifact that runs later without
the Python model definition — XLA's analog of an OpenVINO blob.

The export signature is derived from an example batch (arbitrary feature
schema — multi-feature SasRec/Bert4Rec, TwoTower with item-feature
constants), mirroring the reference's schema-driven input declaration
(base_compiled_model.py:54); without one it defaults to the classic
``(item_id, padding_mask)`` pair.

Modes mirror the reference (`mode` of BaseCompiledModel):
- ``one_query``: batch_size fixed to 1;
- ``batch``: fixed ``batch_size``;
- ``dynamic_batch_size``: symbolic batch dimension via export symbolic shapes.
"""

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

# bookkeeping fields that never feed the model's forward pass
_NON_MODEL_FIELDS = ("batch_mask", "query_id", "seq_len")


class CompiledSequentialModel:
    """Serialized forward_inference of a sequential model."""

    def __init__(self, exported, field_specs, max_sequence_length: int, mode: str):
        self._exported = exported
        # [(name, trailing_shape_tuple, dtype_str), ...] in call order
        self.field_specs = field_specs
        self.batch_fields = tuple(name for name, _, _ in field_specs)
        self.max_sequence_length = max_sequence_length
        self.mode = mode

    # --------------------------------------------------------------- compile
    @classmethod
    def compile(
        cls,
        model,
        params,
        batch_size: int = 1,
        max_sequence_length: Optional[int] = None,
        mode: str = "batch",
        extra_variables: Optional[Dict] = None,
        example_batch: Optional[Dict[str, np.ndarray]] = None,
    ) -> "CompiledSequentialModel":
        """Trace + lower ``model.forward_inference`` into a StableHLO artifact.

        :param mode: ``one_query`` | ``batch`` | ``dynamic_batch_size``.
        :param example_batch: any batch the model accepts; its per-field
            trailing shapes and dtypes define the export signature
            (bookkeeping fields ``batch_mask``/``query_id``/``seq_len`` are
            dropped). Defaults to ``{item_id, padding_mask}``.
        """
        if mode not in ("one_query", "batch", "dynamic_batch_size"):
            msg = f"Unknown mode {mode}"
            raise ValueError(msg)
        length = max_sequence_length or model.max_sequence_length
        if mode == "one_query":
            batch_size = 1
        variables = {"params": params, **(extra_variables or {})}

        if example_batch is not None:
            field_specs = [
                (name, tuple(np.asarray(v).shape[1:]), str(np.asarray(v).dtype))
                for name, v in sorted(example_batch.items())
                if name not in _NON_MODEL_FIELDS and hasattr(v, "shape")
            ]
        else:
            field_specs = [
                ("item_id", (length,), "int32"),
                ("padding_mask", (length,), "int8"),
            ]
        names = [name for name, _, _ in field_specs]

        def fn(*arrays):
            batch = dict(zip(names, arrays))
            return model.apply(variables, batch, method=type(model).forward_inference)

        if mode == "dynamic_batch_size":
            b = jax_export.symbolic_shape("b")[0]
        else:
            b = batch_size
        args = tuple(
            jax.ShapeDtypeStruct((b, *shape), jnp.dtype(dtype))
            for _, shape, dtype in field_specs
        )
        exported = jax_export.export(jax.jit(fn))(*args)
        return cls(exported, field_specs, length, mode)

    # --------------------------------------------------------------- predict
    def _cached(self, key, build):
        """Jitted entry points are built once and reused: ``Exported.call``
        re-traces on every invocation, which under the remote-compile tunnel
        re-lowers (measured 1.6 s/call before caching vs 2 ms after)."""
        cache = getattr(self, "_call_cache", None)
        if cache is None:
            cache = self._call_cache = {}
        if key not in cache:
            cache[key] = build()
        return cache[key]

    def _args(self, batch):
        return [
            jnp.asarray(batch[name], dtype=jnp.dtype(dtype))
            for name, _, dtype in self.field_specs
        ]

    def predict(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """[B, n_items] logits from a padded batch dict."""
        fn = self._cached("logits", lambda: jax.jit(self._exported.call))
        return np.asarray(fn(*self._args(batch)))

    def predict_topk(self, batch: Dict[str, np.ndarray], k: int):
        """Top-k on device inside the same jit — only [B, k] crosses back."""
        fn = self._cached(
            ("topk", k),
            lambda: jax.jit(
                lambda *a: jax.lax.top_k(self._exported.call(*a), k)
            ),
        )
        vals, idx = fn(*self._args(batch))
        return np.asarray(vals), np.asarray(idx)

    # ------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        target = Path(path)
        target.mkdir(parents=True, exist_ok=True)
        (target / "model.stablehlo").write_bytes(self._exported.serialize())
        meta = {
            "mode": self.mode,
            "max_sequence_length": self.max_sequence_length,
            "field_specs": [
                [name, list(shape), dtype] for name, shape, dtype in self.field_specs
            ],
        }
        (target / "meta.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str) -> "CompiledSequentialModel":
        target = Path(path)
        exported = jax_export.deserialize((target / "model.stablehlo").read_bytes())
        legacy = target / "meta.txt"
        if legacy.exists():  # round-1 artifacts
            mode, length = legacy.read_text().strip().split("\n")
            specs = [("item_id", (int(length),), "int32"), ("padding_mask", (int(length),), "int8")]
            return cls(exported, specs, int(length), mode)
        meta = json.loads((target / "meta.json").read_text())
        specs = [
            (name, tuple(shape), dtype) for name, shape, dtype in meta["field_specs"]
        ]
        return cls(exported, specs, int(meta["max_sequence_length"]), meta["mode"])


class SasRecCompiled(CompiledSequentialModel):
    """Reference name (replay/models/nn/sequential/compiled/sasrec_compiled.py)
    — a CompiledSequentialModel built from a SasRec; the export machinery is
    model-agnostic, so this is the same class under the upstream spelling."""


class Bert4RecCompiled(CompiledSequentialModel):
    """Reference name (compiled/bert4rec_compiled.py); see SasRecCompiled."""
