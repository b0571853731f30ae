"""Distributed top-k, sharding rules, and embedding surgery tests."""

import pytest as _pytest

pytestmark = _pytest.mark.mesh

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from replay_tpu.parallel import infer_param_shardings, make_mesh
from replay_tpu.parallel.distributed_topk import distributed_topk

rng = np.random.default_rng(0)


class TestDistributedTopK:
    @pytest.mark.parametrize("model_axis", [2, 4, 8])
    def test_exact_vs_single_device(self, model_axis):
        mesh = make_mesh(data=8 // model_axis, model=model_axis)
        B, N, D, k = 8, 512, 16, 7
        q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        w_sharded = jax.device_put(w, NamedSharding(mesh, P("model", None)))
        vals, idx = distributed_topk(q, w_sharded, k, mesh)
        ref_v, ref_i = jax.lax.top_k(
            jnp.dot(q, w.T, preferred_element_type=jnp.float32), k
        )
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_k_larger_than_shard(self):
        """k > rows-per-shard still returns the exact global top-k."""
        mesh = make_mesh(data=1, model=8)
        B, N, D, k = 4, 64, 8, 16  # 8 rows/shard < k
        q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        w_sharded = jax.device_put(w, NamedSharding(mesh, P("model", None)))
        vals, idx = distributed_topk(q, w_sharded, k, mesh)
        ref_v, ref_i = jax.lax.top_k(jnp.dot(q, w.T), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)


class TestShardingRules:
    def test_large_embedding_sharded_small_replicated(self):
        mesh = make_mesh(data=4, model=2)
        params = {
            "emb": {"table": {"embedding": jnp.zeros((32768, 64))}},
            "small": {"embedding": jnp.zeros((100, 64))},
            "dense": {"kernel": jnp.zeros((64, 64))},
        }
        shardings = infer_param_shardings(params, mesh)
        assert shardings["emb"]["table"]["embedding"].spec == P("model", None)
        assert shardings["small"]["embedding"].spec == P()
        assert shardings["dense"]["kernel"].spec == P()


class TestEmbeddingSurgery:
    def make_model(self, cardinality=40):
        from replay_tpu.data.nn.schema import (
            TensorFeatureInfo,
            TensorFeatureSource,
            TensorFeatureType,
            TensorSchema,
        )
        from replay_tpu.data.schema import FeatureHint, FeatureSource
        from replay_tpu.nn.sequential.sasrec import SasRec

        schema = TensorSchema(
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                cardinality=cardinality,
                embedding_dim=16,
                padding_value=cardinality,
            )
        )
        model = SasRec(schema=schema, max_sequence_length=8, num_blocks=1, num_heads=2)
        batch = {
            "item_id": jnp.zeros((2, 8), jnp.int32),
            "padding_mask": jnp.ones((2, 8), jnp.int8),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            deterministic=True,
        )
        return model, schema, variables["params"], batch

    def test_grow_by_size_preserves_old_rows(self):
        from replay_tpu.nn.surgery import set_item_embeddings_by_size

        model, schema, params, batch = self.make_model(40)
        old_table = params["body"]["embedder"]["emb_item_id"]["table"]["embedding"]
        new_params, new_schema = set_item_embeddings_by_size(params, schema, 300)
        new_table = new_params["body"]["embedder"]["emb_item_id"]["table"]["embedding"]
        np.testing.assert_array_equal(np.asarray(new_table[:40]), np.asarray(old_table[:40]))
        assert new_schema["item_id"].cardinality == 300
        assert new_table.shape[0] >= 302
        # grown model runs and scores the larger catalog
        from replay_tpu.nn.sequential.sasrec import SasRec

        grown = SasRec(schema=new_schema, max_sequence_length=8, num_blocks=1, num_heads=2)
        logits = grown.apply({"params": new_params}, batch, method=SasRec.forward_inference)
        assert logits.shape == (2, 300)

    def test_shrink_rejected(self):
        from replay_tpu.nn.surgery import set_item_embeddings_by_size

        _, schema, params, _ = self.make_model(40)
        with pytest.raises(ValueError):
            set_item_embeddings_by_size(params, schema, 10)

    def test_append_rows(self):
        from replay_tpu.nn.surgery import append_item_embeddings

        model, schema, params, batch = self.make_model(40)
        new_rows = np.full((3, 16), 0.5, dtype=np.float32)
        new_params, new_schema = append_item_embeddings(params, schema, new_rows)
        table = new_params["body"]["embedder"]["emb_item_id"]["table"]["embedding"]
        np.testing.assert_allclose(np.asarray(table[40:43], np.float32), 0.5)
        assert new_schema["item_id"].cardinality == 43

    def test_set_by_tensor(self):
        from replay_tpu.nn.surgery import set_item_embeddings_by_tensor

        model, schema, params, _ = self.make_model(40)
        tensor = np.ones((50, 16), dtype=np.float32)
        new_params, new_schema = set_item_embeddings_by_tensor(params, schema, tensor)
        table = new_params["body"]["embedder"]["emb_item_id"]["table"]["embedding"]
        np.testing.assert_allclose(np.asarray(table[:50], np.float32), 1.0)
        assert new_schema["item_id"].cardinality == 50
        with pytest.raises(ValueError):
            set_item_embeddings_by_tensor(params, schema, np.ones((50, 8)))
