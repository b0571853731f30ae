"""Hyperparameter optimization (reference:
replay/models/optimization/__init__.py — IsOptimizible, ObjectiveWrapper,
ItemKNNObjective).  ``IsOptimizible`` is the reference's name for the mixin
that grants ``optimize()``; canonical name here: :class:`OptimizeMixin`.
Unlike the reference, the objective classes are importable without optuna —
the built-in TPE-lite sampler drives them when optuna is absent.
"""

from replay_tpu.models.optimization.search import (
    ItemKNNObjective,
    ObjectiveWrapper,
    OptimizeMixin,
    Study,
    Trial,
    eval_quality,
    suggest_params,
)
from replay_tpu.utils.types import OPTUNA_AVAILABLE

IsOptimizible = OptimizeMixin

__all__ = [
    "IsOptimizible",
    "ItemKNNObjective",
    "OPTUNA_AVAILABLE",
    "ObjectiveWrapper",
    "OptimizeMixin",
    "Study",
    "Trial",
    "eval_quality",
    "suggest_params",
]
