from replay_tpu.scenarios.fallback import Fallback, fallback_merge

__all__ = ["Fallback", "fallback_merge"]
