from replay_tpu.experimental.nn import data

__all__ = ["data"]
