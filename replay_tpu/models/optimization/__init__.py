from replay_tpu.models.optimization.search import (
    OptimizeMixin,
    Study,
    Trial,
    suggest_params,
)

__all__ = ["OptimizeMixin", "Study", "Trial", "suggest_params"]
