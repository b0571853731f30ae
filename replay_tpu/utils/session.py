"""Runtime session state + logging setup.

TPU-native analog of the reference session handler (reference:
replay/utils/session_handler.py — ``State`` Borg :120, ``get_spark_session``
:22, ``logger_with_settings`` :102).  There is no Spark session to manage;
the shared state is the device mesh and the configured logger.
"""

import logging
from typing import Any, Dict, Optional

import jax


class State:
    """Borg-pattern shared state: default mesh + arbitrary session values
    (reference: session_handler.py:120)."""

    _shared: Dict[str, Any] = {}

    def __init__(self, mesh=None):
        self.__dict__ = self._shared
        if mesh is not None:
            self.mesh = mesh
        elif "mesh" not in self._shared:
            self.mesh = None

    @property
    def device_count(self) -> int:
        return jax.device_count()

    @property
    def process_index(self) -> int:
        return jax.process_index()


def get_default_mesh(model: int = 1):
    """Session-wide default mesh (created lazily, cached in State)."""
    state = State()
    if state.mesh is None:
        from replay_tpu.parallel.mesh import make_mesh

        state.mesh = make_mesh(model=model)
    return state.mesh


def logger_with_settings(
    level: int = logging.INFO, name: str = "replay_tpu"
) -> logging.Logger:
    """Configured framework logger (reference: session_handler.py:102)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
    return logger
