"""AOT-compiled inference models (serialized StableHLO).

TPU-native analog of the reference's OpenVINO compilation path (reference:
replay/models/nn/sequential/compiled/base_compiled_model.py:19,54 and
{sasrec,bert4rec}_compiled.py:20 — Lightning ckpt → ONNX → OpenVINO).
Here the export pipeline is jax.export: the model's ``forward_inference``
is traced at a fixed (or symbolically-dynamic) batch shape, lowered to
StableHLO, and serialized to a portable artifact that runs later without
the Python model definition — XLA's analog of an OpenVINO blob.

Modes mirror the reference (`mode` of BaseCompiledModel):
- ``one_query``: batch_size fixed to 1;
- ``batch``: fixed ``batch_size``;
- ``dynamic_batch_size``: symbolic batch dimension via export symbolic shapes.
"""

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


class CompiledSequentialModel:
    """Serialized forward_inference of a sequential model."""

    def __init__(self, exported, batch_fields, max_sequence_length: int, mode: str):
        self._exported = exported
        self.batch_fields = batch_fields
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
    ) -> "CompiledSequentialModel":
        """Trace + lower ``model.forward_inference`` into a StableHLO artifact.

        :param mode: ``one_query`` | ``batch`` | ``dynamic_batch_size``.
        """
        if mode not in ("one_query", "batch", "dynamic_batch_size"):
            msg = f"Unknown mode {mode}"
            raise ValueError(msg)
        length = max_sequence_length or model.max_sequence_length
        if mode == "one_query":
            batch_size = 1
        variables = {"params": params, **(extra_variables or {})}

        def fn(item_id, padding_mask):
            batch = {"item_id": item_id, "padding_mask": padding_mask}
            return model.apply(variables, batch, method=type(model).forward_inference)

        if mode == "dynamic_batch_size":
            b = jax_export.symbolic_shape("b")[0]
            args = (
                jax.ShapeDtypeStruct((b, length), jnp.int32),
                jax.ShapeDtypeStruct((b, length), jnp.int8),
            )
        else:
            args = (
                jax.ShapeDtypeStruct((batch_size, length), jnp.int32),
                jax.ShapeDtypeStruct((batch_size, length), jnp.int8),
            )
        exported = jax_export.export(jax.jit(fn))(*args)
        return cls(exported, ("item_id", "padding_mask"), length, mode)

    # --------------------------------------------------------------- predict
    def predict(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """[B, n_items] logits from a padded batch dict."""
        item_id = jnp.asarray(batch["item_id"], dtype=jnp.int32)
        padding_mask = jnp.asarray(batch["padding_mask"], dtype=jnp.int8)
        return np.asarray(self._exported.call(item_id, padding_mask))

    def predict_topk(self, batch: Dict[str, np.ndarray], k: int):
        logits = jnp.asarray(self.predict(batch))
        vals, idx = jax.lax.top_k(logits, k)
        return np.asarray(vals), np.asarray(idx)

    # ------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        target = Path(path)
        target.mkdir(parents=True, exist_ok=True)
        (target / "model.stablehlo").write_bytes(self._exported.serialize())
        meta = f"{self.mode}\n{self.max_sequence_length}\n"
        (target / "meta.txt").write_text(meta)

    @classmethod
    def load(cls, path: str) -> "CompiledSequentialModel":
        target = Path(path)
        exported = jax_export.deserialize((target / "model.stablehlo").read_bytes())
        mode, length = (target / "meta.txt").read_text().strip().split("\n")
        return cls(exported, ("item_id", "padding_mask"), int(length), mode)
