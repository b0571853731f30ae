"""Canonical per-split transform pipelines per model family.

TPU-native analog of the reference transform templates (reference:
replay/nn/transform/template/{sasrec,twotower}.py:9
make_default_*_transforms): given a TensorSchema, produce the standard
dict of per-split transform pipelines wiring streaming-parquet batches
(whose masks are named ``{col}_mask``, replay_tpu/data/nn/parquet) into
the Trainer's expected field names.
"""

from typing import Callable, Dict

from replay_tpu.data.nn.schema import TensorSchema
from replay_tpu.nn.transforms import (
    Compose,
    MaskedLMTransform,
    NextTokenTransform,
    RenameTransform,
)


def _rename(schema: TensorSchema) -> RenameTransform:
    item = schema.item_id_feature_name
    return RenameTransform({f"{item}_mask": "padding_mask"})


def make_default_sasrec_transforms(schema: TensorSchema) -> Dict[str, Callable]:
    """Next-token pipelines for SasRec (reference: template/sasrec.py:9)."""
    return {
        "train": Compose([_rename(schema), NextTokenTransform()]),
        "validation": _rename(schema),
        "test": _rename(schema),
        "predict": _rename(schema),
    }


def make_default_bert4rec_transforms(
    schema: TensorSchema, mask_prob: float = 0.15
) -> Dict[str, Callable]:
    """Masked-LM pipelines for Bert4Rec."""
    from replay_tpu.nn.sequential.bert4rec import mask_token_id

    return {
        "train": Compose(
            [
                _rename(schema),
                MaskedLMTransform(
                    mask_prob=mask_prob,
                    mask_token=mask_token_id(schema),
                    item_field=schema.item_id_feature_name,
                ),
            ]
        ),
        "validation": _rename(schema),
        "test": _rename(schema),
        "predict": _rename(schema),
    }


def make_default_twotower_transforms(schema: TensorSchema) -> Dict[str, Callable]:
    """Next-token pipelines for TwoTower (reference: template/twotower.py:9)."""
    return make_default_sasrec_transforms(schema)
