"""Device-side compute kernels (JAX/XLA/Pallas)."""

from replay_tpu.ops.scoring import masked_topk, topk_blockwise

__all__ = ["masked_topk", "topk_blockwise"]
