"""Torch-checkpoint import: the reference's own SasRec forward must match
the imported flax model numerically (the migration-path guarantee)."""

import numpy as np
import pytest

pytestmark = pytest.mark.parity

N_ITEMS, DIM, SEQ_LEN, HEADS, BLOCKS = 40, 16, 8, 2, 2


def _build_reference_torch(reference, activation):
    import torch
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn.schema import (
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorSchema,
    )
    from replay.nn.agg import SumAggregator
    from replay.nn.embedding import SequenceEmbedding
    from replay.nn.mask import DefaultAttentionMask
    from replay.nn.sequential import (
        PositionAwareAggregator,
        SasRecBody,
        SasRecTransformerLayer,
    )

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id", FeatureType.CATEGORICAL, is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, padding_value=N_ITEMS, embedding_dim=DIM,
        )
    )
    torch.manual_seed(7)
    body = SasRecBody(
        embedder=SequenceEmbedding(schema=schema),
        embedding_aggregator=PositionAwareAggregator(
            embedding_aggregator=SumAggregator(embedding_dim=DIM),
            max_sequence_length=SEQ_LEN, dropout=0.0,
        ),
        attn_mask_builder=DefaultAttentionMask(
            reference_feature_name="item_id", num_heads=HEADS
        ),
        encoder=SasRecTransformerLayer(
            embedding_dim=DIM, num_heads=HEADS, num_blocks=BLOCKS,
            dropout=0.0, activation=activation,
        ),
        output_normalization=torch.nn.LayerNorm(DIM, eps=1e-8),
    )
    body.eval()
    return body


@pytest.mark.parametrize("activation", ["relu", "gelu"])
def test_sasrec_torch_import_matches_reference_forward(reference, activation):
    import torch

    from replay_tpu.data.nn.schema import (
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorFeatureType,
        TensorSchema,
    )
    from replay_tpu.data.schema import FeatureHint, FeatureSource
    from replay_tpu.interop import sasrec_from_torch
    from replay_tpu.nn.sequential.sasrec import SasRec

    body = _build_reference_torch(reference, activation)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, N_ITEMS, (4, SEQ_LEN)).astype(np.int64)
    # left-padded rows with real padding
    pad = np.ones((4, SEQ_LEN), dtype=bool)
    pad[0, :3] = False
    pad[2, :5] = False
    ids[~pad] = N_ITEMS

    with torch.no_grad():
        t_ids = torch.tensor(ids)
        t_pad = torch.tensor(pad)
        hidden_ref = body({"item_id": t_ids}, t_pad).numpy()

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, embedding_dim=DIM, padding_value=N_ITEMS,
        )
    )
    model, variables = sasrec_from_torch(
        schema, body.state_dict(), max_sequence_length=SEQ_LEN,
        num_blocks=BLOCKS, num_heads=HEADS, activation=activation,
    )
    batch = {
        "item_id": ids.astype(np.int32),
        "padding_mask": pad.astype(np.int8),
    }
    hidden_ours = np.asarray(
        model.apply(variables, batch, deterministic=True,
                    method=SasRec.forward_train)
    )
    # padded positions are free to differ (both mask them out of attention);
    # every REAL position must match
    np.testing.assert_allclose(
        hidden_ours[pad], hidden_ref[pad], atol=2e-5, rtol=1e-4
    )

    # and the tying-head logits agree wherever positions are real
    item_w = np.asarray(
        model.apply(variables, method=lambda m: m.body.get_item_weights(None))
    )
    emb_t = body.embedder.feature_embedders["item_id"].emb.weight.detach().numpy()
    logits_ref = hidden_ref @ emb_t[:N_ITEMS].T
    logits_ours = hidden_ours @ item_w[:N_ITEMS].T
    np.testing.assert_allclose(
        logits_ours[pad], logits_ref[pad], atol=5e-5, rtol=1e-4
    )


def test_bert4rec_torch_import_matches_reference_forward(reference):
    import torch
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn.schema import (
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorSchema,
    )
    from replay.models.nn.sequential.bert4rec.model import Bert4RecModel

    from replay_tpu.data.nn.schema import (
        TensorFeatureInfo as MyInfo,
        TensorFeatureSource as MySource,
        TensorFeatureType as MyType,
        TensorSchema as MySchema,
    )
    from replay_tpu.data.schema import FeatureHint as MyHint, FeatureSource as MyFS
    from replay_tpu.interop import bert4rec_from_torch
    from replay_tpu.nn.sequential.bert4rec import Bert4Rec

    ref_schema = TensorSchema(
        TensorFeatureInfo(
            "item_id", FeatureType.CATEGORICAL, is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, padding_value=0, embedding_dim=DIM,
        )
    )
    torch.manual_seed(3)
    ref = Bert4RecModel(schema=ref_schema, max_len=SEQ_LEN, hidden_size=DIM,
                        num_blocks=BLOCKS, num_heads=HEADS)
    ref.eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, N_ITEMS, (4, SEQ_LEN)).astype(np.int64)
    pad = np.ones((4, SEQ_LEN), dtype=bool)
    pad[1, :4] = False
    ids[~pad] = 0
    token_mask = pad.copy()  # no [MASK] substitutions: raw scoring pass

    with torch.no_grad():
        hidden_ref = ref.forward_step(
            {"item_id": torch.tensor(ids)}, torch.tensor(pad),
            torch.tensor(token_mask),
        ).numpy()
        # the reference ClassificationHead is linear + bias over hidden
        logits_ref = (
            hidden_ref @ ref._head.linear.weight.detach().numpy().T
            + ref._head.linear.bias.detach().numpy()
        )

    my_schema = MySchema(
        MyInfo(
            "item_id", MyType.CATEGORICAL, is_seq=True,
            feature_hint=MyHint.ITEM_ID,
            feature_sources=[MySource(MyFS.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, embedding_dim=DIM, padding_value=N_ITEMS,
        )
    )
    model, variables = bert4rec_from_torch(
        my_schema, ref.state_dict(), max_sequence_length=SEQ_LEN,
        num_blocks=BLOCKS, num_heads=HEADS,
    )
    batch = {"item_id": ids.astype(np.int32), "padding_mask": pad.astype(np.int8)}
    hidden_ours = np.asarray(
        model.apply(variables, batch, deterministic=True,
                    method=Bert4Rec.forward_train)
    )
    np.testing.assert_allclose(
        hidden_ours[pad], hidden_ref[pad], atol=2e-5, rtol=1e-4
    )
    logits_ours = np.asarray(
        model.apply(variables, hidden_ours, method=Bert4Rec.get_logits)
    )
    np.testing.assert_allclose(
        logits_ours[pad], logits_ref[pad], atol=5e-5, rtol=1e-4
    )


def test_twotower_torch_import_matches_reference_forward(reference, tmp_path):
    """The reference TwoTower.from_params (shared embedder, kang query
    blocks, SwiGLU item encoder) must match the imported flax TwoTower at
    LOGIT level: query hidden states AND item-tower outputs both line up."""
    import pandas as pd
    import torch
    from replay.data import FeatureHint, FeatureSource, FeatureType
    from replay.data.nn.schema import (
        TensorFeatureInfo,
        TensorFeatureSource,
        TensorSchema,
    )
    from replay.nn.sequential.twotower import FeaturesReader, TwoTower

    schema = TensorSchema(
        TensorFeatureInfo(
            "item_id", FeatureType.CATEGORICAL, is_seq=True,
            feature_hint=FeatureHint.ITEM_ID,
            feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, padding_value=N_ITEMS, embedding_dim=DIM,
        )
    )
    catalog = str(tmp_path / "items.parquet")
    pd.DataFrame({"item_id": np.arange(N_ITEMS)}).to_parquet(catalog)
    torch.manual_seed(11)
    ref = TwoTower.from_params(
        schema,
        FeaturesReader(schema=schema, metadata={"item_id": {}}, path=catalog),
        embedding_dim=DIM, num_heads=HEADS, num_blocks=BLOCKS,
        max_sequence_length=SEQ_LEN, dropout=0.0,
    )
    ref.eval()

    rng = np.random.default_rng(3)
    ids = rng.integers(0, N_ITEMS, (4, SEQ_LEN)).astype(np.int64)
    pad = np.ones((4, SEQ_LEN), dtype=bool)
    pad[1, :4] = False
    ids[~pad] = N_ITEMS
    with torch.no_grad():
        hidden_ref = ref.body.query_tower({"item_id": torch.tensor(ids)}, torch.tensor(pad)).numpy()
        item_ref = ref.body.item_tower().numpy()
        logits_ref = hidden_ref @ item_ref.T

    from replay_tpu.data.nn.schema import (
        TensorFeatureInfo as OurInfo,
        TensorFeatureSource as OurSource,
        TensorFeatureType,
        TensorSchema as OurSchema,
    )
    from replay_tpu.data.schema import (
        FeatureHint as OurHint,
        FeatureSource as OurFeatureSource,
    )
    from replay_tpu.interop import twotower_from_torch
    from replay_tpu.nn.sequential.twotower import TwoTower as OurTwoTower

    our_schema = OurSchema(
        OurInfo(
            "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
            feature_hint=OurHint.ITEM_ID,
            feature_sources=[OurSource(OurFeatureSource.INTERACTIONS, "item_id")],
            cardinality=N_ITEMS, embedding_dim=DIM, padding_value=N_ITEMS,
        )
    )
    model, variables = twotower_from_torch(
        our_schema, ref.state_dict(), max_sequence_length=SEQ_LEN,
        num_blocks=BLOCKS, num_heads=HEADS,
    )
    batch = {"item_id": ids.astype(np.int32), "padding_mask": pad.astype(np.int8)}
    hidden_ours = np.asarray(
        model.apply(variables, batch, deterministic=True,
                    method=OurTwoTower.forward_train)
    )
    np.testing.assert_allclose(
        hidden_ours[pad], hidden_ref[pad], atol=2e-5, rtol=1e-4
    )
    item_ours = np.asarray(
        model.apply(variables, method=lambda m: m.body.get_item_weights(None))
    )
    np.testing.assert_allclose(item_ours, item_ref, atol=2e-5, rtol=1e-4)
    logits_ours = hidden_ours @ item_ours.T
    np.testing.assert_allclose(
        logits_ours[pad], logits_ref[pad], atol=5e-5, rtol=1e-4
    )
