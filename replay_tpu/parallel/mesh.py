"""Device mesh construction.

The reference's distribution story is Spark executors + Lightning DDP
(reference: replay/nn/lightning/module.py:66-74, SURVEY.md §2.8); the
TPU-native equivalent is a ``jax.sharding.Mesh`` with two axes:

- ``data``  — batch (data-parallel) axis; gradients all-reduce over ICI;
- ``model`` — catalog axis; item/user embedding tables are row-sharded
  here and full-catalog logits/top-k are computed shard-locally then
  merged (SURVEY.md §5.7: the recsys "large axis" is the catalog).

On one chip the mesh is (1, 1) and everything degenerates to local compute
with zero collective cost — the same program runs unchanged.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over available devices.

    :param data: size of the data axis; default = n_devices // model.
    :param model: size of the model (catalog-sharding) axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            msg = f"{n} devices not divisible by model={model}"
            raise ValueError(msg)
        data = n // model
    if data * model != n:
        devices = devices[: data * model]
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=axis_names)
