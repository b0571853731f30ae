"""Data layer: schema, Dataset (reference: replay/data/)."""

from replay_tpu.data.dataset import Dataset, nunique, select
from replay_tpu.data.utils import get_schema
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)

__all__ = [
    "Dataset",
    "FeatureHint",
    "FeatureInfo",
    "FeatureSchema",
    "FeatureSource",
    "FeatureType",
    "get_schema",
    "nunique",
    "select",
]
