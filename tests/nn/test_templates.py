"""Transform template tests."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax
import numpy as np

from replay_tpu.nn.templates import (
    make_default_bert4rec_transforms,
    make_default_sasrec_transforms,
    make_default_twotower_transforms,
)

from tests.nn.conftest import N_ITEMS


def make_parquet_style_batch(item_schema):
    rng = np.random.default_rng(0)
    return {
        "item_id": rng.integers(0, N_ITEMS, (4, 9)).astype(np.int32),
        "item_id_mask": np.ones((4, 9), dtype=np.int8),
        "query_id": np.arange(4),
        "batch_mask": np.ones(4, dtype=np.int8),
    }


def test_sasrec_template(item_schema):
    transforms = make_default_sasrec_transforms(item_schema)
    batch = make_parquet_style_batch(item_schema)
    out = transforms["train"](batch, key=jax.random.PRNGKey(0))
    assert "padding_mask" in out and "labels" in out
    assert out["item_id"].shape == (4, 8)
    val = transforms["validation"](batch)
    assert "padding_mask" in val and "labels" not in val


def test_bert4rec_template(item_schema):
    transforms = make_default_bert4rec_transforms(item_schema, mask_prob=0.3)
    batch = make_parquet_style_batch(item_schema)
    out = transforms["train"](batch, key=jax.random.PRNGKey(0))
    assert "labels" in out and "token_mask" in out
    # masked positions replaced by the mask token (> padding id)
    masked = np.asarray(out["token_mask"]).astype(bool)
    assert np.all(np.asarray(out["item_id"])[masked] == N_ITEMS + 1)


def test_twotower_template_same_as_sasrec(item_schema):
    t = make_default_twotower_transforms(item_schema)
    assert set(t) == {"train", "validation", "test", "predict"}


def test_standalone_aggregators():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from replay_tpu.nn.agg import ConcatAggregator, PositionAwareAggregator, SumAggregator

    embs = {
        "a": jnp.ones((2, 4, 8)),
        "b": jnp.full((2, 4, 8), 2.0),
    }
    s = SumAggregator()
    out = s.apply(s.init(jax.random.PRNGKey(0), embs), embs)
    np.testing.assert_allclose(np.asarray(out), 3.0)

    c = ConcatAggregator(output_dim=6)
    params = c.init(jax.random.PRNGKey(0), embs)
    assert c.apply(params, embs).shape == (2, 4, 6)

    p = PositionAwareAggregator(max_len=4)
    params = p.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, embs)
    assert p.apply(params, embs).shape == (2, 4, 8)
