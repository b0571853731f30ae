from replay_tpu.interop.torch_import import (
    sasrec_from_torch,
    sasrec_params_from_torch,
)

__all__ = ["sasrec_from_torch", "sasrec_params_from_torch"]
