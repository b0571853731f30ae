import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.data.nn.sequential_dataset import SequentialDataset
from replay_tpu.data.schema import FeatureHint, FeatureSource

N_ITEMS = 40


@pytest.fixture()
def item_schema():
    return TensorSchema(
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS,
            embedding_dim=16,
            padding_value=N_ITEMS,
        )
    )


@pytest.fixture()
def seq_dataset(item_schema):
    rng = np.random.default_rng(0)
    rows = []
    for u in range(24):
        # skewed popularity so models have signal to learn
        items = rng.zipf(1.5, size=rng.integers(4, 15)) % N_ITEMS
        for t, i in enumerate(items):
            rows.append((u, int(i), t))
    log = pd.DataFrame(rows, columns=["query_id", "item_id", "timestamp"])
    return SequentialDataset.from_interactions(item_schema, log)
