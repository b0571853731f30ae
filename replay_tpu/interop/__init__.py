from replay_tpu.interop.torch_import import (
    bert4rec_from_torch,
    bert4rec_params_from_torch,
    sasrec_from_torch,
    sasrec_params_from_torch,
    twotower_from_torch,
    twotower_params_from_torch,
)

__all__ = [
    "bert4rec_from_torch",
    "bert4rec_params_from_torch",
    "sasrec_from_torch",
    "sasrec_params_from_torch",
    "twotower_from_torch",
    "twotower_params_from_torch",
]
