"""Unit tests for the nn building blocks (reference test files:
tests/nn/test_agg.py, test_embedding.py, test_head.py, test_mask.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from replay_tpu.data.schema import FeatureHint, FeatureSource
from replay_tpu.data.nn.schema import (
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorFeatureType,
    TensorSchema,
)
from replay_tpu.nn.agg import ConcatAggregator, PositionAwareAggregator, SumAggregator
from replay_tpu.nn.attention import NEG_INF, build_attention_bias
from replay_tpu.nn.embedding import (
    CategoricalEmbedding,
    NumericalEmbedding,
    PositionalEmbedding,
    SequenceEmbedding,
)
from replay_tpu.nn.ffn import PointWiseFeedForward, SwiGLU
from replay_tpu.nn.head import EmbeddingTyingHead, tying_logits
from replay_tpu.nn.mask import DefaultAttentionMask
from replay_tpu.nn.normalization import RMSNorm

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------- aggregators


class TestAggregators:
    def _embs(self):
        return {
            "a": jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4),
            "b": jnp.ones((2, 3, 4), dtype=jnp.float32),
        }

    def test_sum_is_elementwise_sum(self):
        out, _ = SumAggregator().init_with_output(KEY, self._embs())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._embs()["a"]) + 1.0
        )

    def test_concat_projects_to_output_dim(self):
        agg = ConcatAggregator(output_dim=6)
        out, params = agg.init_with_output(KEY, self._embs())
        assert out.shape == (2, 3, 6)
        # projection input is the 8-wide concat
        assert params["params"]["proj"]["kernel"].shape == (8, 6)

    def test_position_aware_matches_sasrec_input_pipeline(self):
        """out = sum(emb) * sqrt(D) + pos[-L:] (right-aligned)."""
        agg = PositionAwareAggregator(max_len=5)
        embs = self._embs()
        out, params = agg.init_with_output(KEY, embs, deterministic=True)
        table = params["params"]["pos_table"]["embedding"]  # [5, 4]
        expected = (np.asarray(embs["a"]) + 1.0) * 2.0 + np.asarray(table[2:])[None]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


# -------------------------------------------------------------- embeddings


class TestEmbeddings:
    def test_categorical_table_is_lane_aligned(self):
        assert CategoricalEmbedding.padded_rows(10) == 128
        assert CategoricalEmbedding.padded_rows(127) == 256  # +2 sentinel rows
        assert CategoricalEmbedding.padded_rows(1000) == 1024

    def test_categorical_lookup_shape(self):
        emb = CategoricalEmbedding(cardinality=10, embedding_dim=8)
        ids = jnp.array([[0, 1, 10]])  # 10 = padding id
        out, params = emb.init_with_output(KEY, ids)
        assert out.shape == (1, 3, 8)
        assert params["params"]["table"]["embedding"].shape == (128, 8)

    def test_numerical_scalar_feature_gets_channel_axis(self):
        emb = NumericalEmbedding(tensor_dim=1, embedding_dim=8)
        out, _ = emb.init_with_output(KEY, jnp.ones((2, 5)))
        assert out.shape == (2, 5, 8)

    def test_positional_right_aligned(self):
        emb = PositionalEmbedding(max_len=10, embedding_dim=4)
        out, params = emb.init_with_output(KEY, 3)
        table = params["params"]["pos_table"]["embedding"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(table[7:]))


def _schema(extra=()):
    features = [
        TensorFeatureInfo(
            "item_id",
            TensorFeatureType.CATEGORICAL,
            is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=20,
            embedding_dim=8,
        ),
        *extra,
    ]
    return TensorSchema(features)


class TestSequenceEmbedding:
    def test_sum_mode_adds_features(self):
        schema = _schema(
            [
                TensorFeatureInfo(
                    "cat",
                    TensorFeatureType.CATEGORICAL,
                    is_seq=True,
                    feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "cat")],
                    cardinality=5,
                    embedding_dim=8,
                )
            ]
        )
        emb = SequenceEmbedding(schema=schema, aggregation_mode="sum")
        batch = {"item_id": jnp.zeros((2, 4), jnp.int32), "cat": jnp.zeros((2, 4), jnp.int32)}
        out, params = emb.init_with_output(KEY, batch)
        assert out.shape == (2, 4, 8)
        item_row = params["params"]["emb_item_id"]["table"]["embedding"][0]
        cat_row = params["params"]["emb_cat"]["table"]["embedding"][0]
        np.testing.assert_allclose(
            np.asarray(out[0, 0]), np.asarray(item_row + cat_row), rtol=1e-6
        )

    def test_concat_mode_widens(self):
        schema = _schema(
            [
                TensorFeatureInfo(
                    "cat",
                    TensorFeatureType.CATEGORICAL,
                    is_seq=True,
                    feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "cat")],
                    cardinality=5,
                    embedding_dim=4,
                )
            ]
        )
        emb = SequenceEmbedding(schema=schema, aggregation_mode="concat")
        batch = {"item_id": jnp.zeros((2, 4), jnp.int32), "cat": jnp.zeros((2, 4), jnp.int32)}
        out, _ = emb.init_with_output(KEY, batch)
        assert out.shape == (2, 4, 12)

    def test_get_item_weights_full_and_subset(self):
        schema = _schema()
        emb = SequenceEmbedding(schema=schema)
        batch = {"item_id": jnp.zeros((1, 2), jnp.int32)}
        params = emb.init(KEY, batch)

        def full(params):
            return emb.apply(params, None, method="get_item_weights")

        def subset(params):
            return emb.apply(params, jnp.array([3, 7]), method="get_item_weights")

        w = full(params)
        assert w.shape == (20, 8)  # catalog rows only, no padding row
        ws = subset(params)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(w[jnp.array([3, 7])]))


# ------------------------------------------------------------------- head


class TestTyingHead:
    def test_logits_are_f32_gemm(self):
        hidden = jax.random.normal(KEY, (2, 3, 8), dtype=jnp.bfloat16)
        table = jax.random.normal(jax.random.PRNGKey(1), (10, 8), dtype=jnp.bfloat16)
        logits = tying_logits(hidden, table)
        assert logits.shape == (2, 3, 10)
        assert logits.dtype == jnp.float32
        expected = np.asarray(hidden, np.float32) @ np.asarray(table, np.float32).T
        np.testing.assert_allclose(np.asarray(logits), expected, atol=1e-2)

    def test_bias_added(self):
        hidden = jnp.ones((1, 4), jnp.float32)
        table = jnp.ones((3, 4), jnp.float32)
        bias = jnp.array([0.0, 1.0, 2.0])
        logits = tying_logits(hidden, table, bias)
        np.testing.assert_allclose(np.asarray(logits[0]), [4.0, 5.0, 6.0])

    def test_head_candidate_path(self):
        table = jnp.arange(40, dtype=jnp.float32).reshape(10, 4)
        head = EmbeddingTyingHead(
            lambda ids: table if ids is None else jnp.take(table, ids, axis=0)
        )
        hidden = jnp.ones((2, 4), jnp.float32)
        full = head(hidden)
        sub = head(hidden, jnp.array([1, 5]))
        np.testing.assert_allclose(np.asarray(sub), np.asarray(full[:, [1, 5]]))


# ------------------------------------------------------------------- masks


class TestAttentionMask:
    def test_causal_band_and_padding(self):
        pm = jnp.array([[0, 1, 1]])  # first position is padding
        bias = build_attention_bias(pm, causal=True)
        assert bias.shape == (1, 1, 3, 3)
        b = np.asarray(bias[0, 0])
        assert b[1, 1] == 0.0  # self-attend allowed
        assert b[1, 2] == NEG_INF  # future masked
        assert b[2, 0] == NEG_INF  # padded key masked
        assert b[2, 1] == 0.0 and b[2, 2] == 0.0

    def test_bidirectional_only_masks_padding(self):
        pm = jnp.array([[0, 1, 1]])
        b = np.asarray(build_attention_bias(pm, causal=False)[0, 0])
        assert (b[:, 0] == NEG_INF).all()
        assert (b[:, 1:] == 0.0).all()

    def test_default_attention_mask_wrapper(self):
        pm = jnp.ones((2, 4), jnp.int32)
        causal = DefaultAttentionMask(causal=True)(pm)
        bidir = DefaultAttentionMask(causal=False)(pm)
        assert np.asarray(causal[0, 0])[0, 3] == NEG_INF
        assert (np.asarray(bidir) == 0.0).all()


# ------------------------------------------------------------- norm / ffn


class TestNormAndFFN:
    def test_rmsnorm_unit_rms(self):
        x = jax.random.normal(KEY, (4, 16)) * 7.0
        out, _ = RMSNorm().init_with_output(KEY, x)
        rms = np.sqrt(np.mean(np.square(np.asarray(out, np.float32)), axis=-1))
        np.testing.assert_allclose(rms, 1.0, rtol=1e-3)

    def test_rmsnorm_no_mean_subtraction(self):
        x = jnp.full((1, 8), 3.0)
        out, _ = RMSNorm().init_with_output(KEY, x)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)

    @pytest.mark.parametrize("block", [PointWiseFeedForward, SwiGLU])
    def test_ffn_preserves_shape(self, block):
        x = jax.random.normal(KEY, (2, 5, 16))
        mod = block(hidden_dim=32) if "hidden_dim" in block.__dataclass_fields__ else block()
        out, _ = mod.init_with_output(KEY, x, deterministic=True)
        assert out.shape == x.shape
