"""Import trained reference (torch) checkpoints into replay_tpu models.

A migrating user's most valuable artifact is a trained model.  This module
maps the reference's new-tier SasRec state_dict
(reference: replay/nn/sequential/sasrec/model.py:43 SasRecBody — embedder /
PositionAwareAggregator / SasRecTransformerLayer / output LayerNorm) onto
the flax parameter tree of :class:`replay_tpu.nn.sequential.sasrec.SasRec`
constructed in its reference-exact configuration
(``variant="kang"``, ``layer_norm_eps=1e-8``, sqrt(D) input scaling,
FFN hidden = D).  Equivalence is verified to ~1e-5 on hidden states in
tests/parity/test_torch_import.py against the reference's own torch model.

Tensors may be torch tensors or numpy arrays (``.detach().cpu().numpy()``
is applied when available), so torch itself is not required at call time.
"""

from typing import Dict, Optional

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _strip_prefix(state_dict: Dict, prefix: str = "body.") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        key = k[len(prefix):] if k.startswith(prefix) else k
        out[key] = _np(v)
    return out


def sasrec_params_from_torch(state_dict: Dict, params, num_heads: int,
                             item_feature: str = "item_id"):
    """Map a reference SasRec(Body) state_dict onto an existing flax params
    tree (as produced by ``model.init`` on a kang-variant SasRec).

    :param state_dict: reference ``SasRec``/``SasRecBody`` state_dict
        (``body.``-prefixed keys accepted).
    :param params: the template params pytree; returned copy has every
        mapped weight replaced.
    :param num_heads: attention heads of the checkpoint.
    :returns: new params pytree.
    """
    import flax

    sd = _strip_prefix(dict(state_dict))
    params = flax.core.unfreeze(flax.core.freeze(params))  # deep copy
    body = params["body"]

    # --- embeddings: torch [N+1, D] rows land in the head of our padded table
    table = body["embedder"][f"emb_{item_feature}"]["table"]["embedding"]
    src = sd[f"embedder.feature_embedders.{item_feature}.emb.weight"]
    new_table = np.zeros(np.shape(table), dtype=np.float32)
    new_table[: src.shape[0]] = src
    body["embedder"][f"emb_{item_feature}"]["table"]["embedding"] = new_table
    d = src.shape[1]
    dh = d // num_heads

    body["pos"]["pos_table"]["embedding"] = sd["embedding_aggregator.pe.weight"]

    i = 0
    while f"encoder.attention_layers.{i}.in_proj_weight" in sd:
        layer = body[f"layer_{i}"]
        in_w = sd[f"encoder.attention_layers.{i}.in_proj_weight"]  # [3D, D]
        in_b = sd[f"encoder.attention_layers.{i}.in_proj_bias"]  # [3D]
        for j, name in enumerate(("query", "key", "value")):
            w = in_w[j * d:(j + 1) * d]  # [D(out), D(in)]
            layer["attn"][name]["kernel"] = (
                w.T.reshape(d, num_heads, dh)  # [in, H, Dh]
            )
            layer["attn"][name]["bias"] = (
                in_b[j * d:(j + 1) * d].reshape(num_heads, dh)
            )
        out_w = sd[f"encoder.attention_layers.{i}.out_proj.weight"]  # [D, D]
        layer["attn"]["out"]["kernel"] = out_w.T.reshape(num_heads, dh, d)
        layer["attn"]["out"]["bias"] = sd[f"encoder.attention_layers.{i}.out_proj.bias"]

        layer["ln_attn"]["scale"] = sd[f"encoder.attention_layernorms.{i}.weight"]
        layer["ln_attn"]["bias"] = sd[f"encoder.attention_layernorms.{i}.bias"]
        layer["ln_ffn"]["scale"] = sd[f"encoder.forward_layernorms.{i}.weight"]
        layer["ln_ffn"]["bias"] = sd[f"encoder.forward_layernorms.{i}.bias"]

        # conv1x1 [out, in, 1] → dense kernel [in, out]
        layer["ffn"]["fc1"]["kernel"] = sd[f"encoder.forward_layers.{i}.conv1.weight"][:, :, 0].T
        layer["ffn"]["fc1"]["bias"] = sd[f"encoder.forward_layers.{i}.conv1.bias"]
        layer["ffn"]["fc2"]["kernel"] = sd[f"encoder.forward_layers.{i}.conv2.weight"][:, :, 0].T
        layer["ffn"]["fc2"]["bias"] = sd[f"encoder.forward_layers.{i}.conv2.bias"]
        i += 1

    body["final_norm"]["scale"] = sd["output_normalization.weight"]
    body["final_norm"]["bias"] = sd["output_normalization.bias"]
    return params


def sasrec_from_torch(schema, state_dict: Dict, max_sequence_length: int,
                      num_blocks: int, num_heads: int,
                      activation: str = "relu",
                      dtype: Optional[str] = "float32"):
    """Build the reference-exact flax SasRec and load a torch checkpoint.

    :returns: (model, variables) — use
        ``model.apply(variables, batch, method=SasRec.forward_inference)``.
    """
    import jax

    from replay_tpu.nn.sequential.sasrec import SasRec

    item_name = schema.item_id_feature_name
    dim = schema[item_name].embedding_dim
    model = SasRec(
        schema=schema,
        max_sequence_length=max_sequence_length,
        num_blocks=num_blocks,
        num_heads=num_heads,
        hidden_dim=dim,           # reference FFN is D → D
        dropout_rate=0.0,
        variant="kang",
        layer_norm_eps=1e-8,
        activation=activation,
        # PositionAwareAggregator multiplies embeddings by sqrt(D) before
        # adding positions (reference agg.py:50) — same as our default
        scale_embeddings=True,
        dtype=dtype,
    )
    batch = {
        "item_id": np.zeros((1, max_sequence_length), np.int32),
        "padding_mask": np.ones((1, max_sequence_length), np.int8),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    variables = dict(variables)
    variables["params"] = sasrec_params_from_torch(
        state_dict, variables["params"], num_heads, item_feature=item_name
    )
    return model, variables


def twotower_params_from_torch(state_dict: Dict, params, num_heads: int,
                               item_feature: str = "item_id"):
    """Map a reference TwoTower(Body) state_dict
    (reference: replay/nn/sequential/twotower/model.py:340, from_params
    composition: shared SequenceEmbedding, PositionAwareAggregator,
    SasRecTransformerLayer query encoder, LayerNorm, SwiGLUEncoder item
    encoder) onto a flax TwoTower params tree built in the import config.
    """
    import flax

    raw = _strip_prefix(dict(state_dict))
    consumed: set = set()

    class _Tracking(dict):
        def __getitem__(self, key):
            consumed.add(key)
            return dict.__getitem__(self, key)

        def __contains__(self, key):
            return dict.__contains__(self, key)

    sd = _Tracking(raw)
    params = flax.core.unfreeze(flax.core.freeze(params))  # deep copy
    body = params["body"]

    # shared embedder tables (one per feature; query/item tower aliases of
    # the same module appear multiple times in the torch state_dict)
    for key, src in sd.items():
        if not key.startswith("embedder.feature_embedders."):
            continue
        consumed.add(key)
        name = key.split(".")[2]
        slot = body["embedder"][f"emb_{name}"]["table"]["embedding"]
        new_table = np.zeros(np.shape(slot), dtype=np.float32)
        new_table[: src.shape[0]] = src
        body["embedder"][f"emb_{name}"]["table"]["embedding"] = new_table

    d = sd[f"embedder.feature_embedders.{item_feature}.emb.weight"].shape[1]
    dh = d // num_heads
    body["pos"]["pos_table"]["embedding"] = sd[
        "query_tower.embedding_aggregator.pe.weight"
    ]

    i = 0
    while f"query_tower.encoder.attention_layers.{i}.in_proj_weight" in sd:
        layer = body[f"layer_{i}"]
        prefix = f"query_tower.encoder"
        in_w = sd[f"{prefix}.attention_layers.{i}.in_proj_weight"]  # [3D, D]
        in_b = sd[f"{prefix}.attention_layers.{i}.in_proj_bias"]
        for j, name in enumerate(("query", "key", "value")):
            layer["attn"][name]["kernel"] = in_w[j * d:(j + 1) * d].T.reshape(d, num_heads, dh)
            layer["attn"][name]["bias"] = in_b[j * d:(j + 1) * d].reshape(num_heads, dh)
        out_w = sd[f"{prefix}.attention_layers.{i}.out_proj.weight"]
        layer["attn"]["out"]["kernel"] = out_w.T.reshape(num_heads, dh, d)
        layer["attn"]["out"]["bias"] = sd[f"{prefix}.attention_layers.{i}.out_proj.bias"]
        layer["ln_attn"]["scale"] = sd[f"{prefix}.attention_layernorms.{i}.weight"]
        layer["ln_attn"]["bias"] = sd[f"{prefix}.attention_layernorms.{i}.bias"]
        layer["ln_ffn"]["scale"] = sd[f"{prefix}.forward_layernorms.{i}.weight"]
        layer["ln_ffn"]["bias"] = sd[f"{prefix}.forward_layernorms.{i}.bias"]
        layer["ffn"]["fc1"]["kernel"] = sd[f"{prefix}.forward_layers.{i}.conv1.weight"][:, :, 0].T
        layer["ffn"]["fc1"]["bias"] = sd[f"{prefix}.forward_layers.{i}.conv1.bias"]
        layer["ffn"]["fc2"]["kernel"] = sd[f"{prefix}.forward_layers.{i}.conv2.weight"][:, :, 0].T
        layer["ffn"]["fc2"]["bias"] = sd[f"{prefix}.forward_layers.{i}.conv2.bias"]
        i += 1

    body["final_norm"]["scale"] = sd["query_tower.output_normalization.weight"]
    body["final_norm"]["bias"] = sd["query_tower.output_normalization.bias"]

    # item encoder: SwiGLUEncoder sw{1,2}.{WG,W1,W2} (+biases) + RMSNorms
    enc = body["item_encoder"]["encoder"]
    for sw in ("sw1", "sw2"):
        for t_name, f_name in (("WG", "w_gate"), ("W1", "w_up"), ("W2", "w_down")):
            enc[sw][f_name]["kernel"] = sd[f"item_tower.encoder.{sw}.{t_name}.weight"].T
            enc[sw][f_name]["bias"] = sd[f"item_tower.encoder.{sw}.{t_name}.bias"]
    for norm in ("norm1", "norm2"):
        enc[norm]["scale"] = sd[f"item_tower.encoder.{norm}.weight"]

    # a checkpoint whose item tower carries weights this mapper does not
    # know (item-only feature tables, numeric projections, …) must not pass
    # silently with those weights left at random init.  Tower-prefixed
    # aliases of the shared embedder and the reference's non-parameter
    # buffers (item_tower.cache / item_reference_*) are expected leftovers.
    def _is_alias_or_buffer(key: str) -> bool:
        for tower in ("query_tower.", "item_tower."):
            if key.startswith(tower) and key[len(tower):] in consumed:
                return True
        tail = key.split(".", 1)[-1]
        return tail == "cache" or tail.startswith("item_reference")

    leftover = sorted(k for k in set(raw) - consumed if not _is_alias_or_buffer(k))
    if leftover:
        import warnings

        warnings.warn(
            "twotower_params_from_torch: unconsumed state_dict keys (their "
            f"weights were NOT imported): {leftover}",
            stacklevel=2,
        )
    return params


def twotower_from_torch(schema, state_dict: Dict, max_sequence_length: int,
                        num_blocks: int, num_heads: int,
                        activation: str = "relu",
                        dtype: Optional[str] = "float32"):
    """Build the reference-exact flax TwoTower and load a torch checkpoint.

    Reference from_params defaults reproduced: kang-variant query blocks
    with FFN hidden = D and torch LayerNorm eps 1e-8, sqrt(D) input scaling,
    SwiGLU item encoder with hidden 2·D (twotower/model.py:536).
    :returns: (model, variables).
    """
    import jax

    from replay_tpu.nn.sequential.twotower import TwoTower

    item_name = schema.item_id_feature_name
    dim = schema[item_name].embedding_dim
    wg = next(v for k, v in state_dict.items() if k.endswith("encoder.sw1.WG.weight"))
    item_hidden = int(np.shape(_np(wg))[0])
    model = TwoTower(
        schema=schema,
        max_sequence_length=max_sequence_length,
        num_blocks=num_blocks,
        num_heads=num_heads,
        dropout_rate=0.0,
        item_hidden_dim=item_hidden,
        hidden_dim=dim,          # reference FFN is D → D
        variant="kang",
        layer_norm_eps=1e-8,
        activation=activation,
        scale_embeddings=True,
        dtype=dtype,
    )
    batch = {
        "item_id": np.zeros((1, max_sequence_length), np.int32),
        "padding_mask": np.ones((1, max_sequence_length), np.int8),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    variables = dict(variables)
    variables["params"] = twotower_params_from_torch(
        state_dict, variables["params"], num_heads, item_feature=item_name
    )
    return model, variables


def bert4rec_params_from_torch(state_dict: Dict, params, num_heads: int,
                               cardinality: int, item_feature: str = "item_id"):
    """Map a reference Bert4RecModel state_dict
    (reference: replay/models/nn/sequential/bert4rec/model.py:10) onto a
    flax Bert4Rec params tree built in the import configuration."""
    import flax

    sd = {k: _np(v) for k, v in dict(state_dict).items()}
    params = flax.core.unfreeze(flax.core.freeze(params))  # deep copy
    body = params["body"]

    table = body["embedder"][f"emb_{item_feature}"]["table"]["embedding"]
    src = sd[f"item_embedder.cat_embeddings.{item_feature}.weight"]  # [N, D]
    new_table = np.zeros(np.shape(table), dtype=np.float32)
    new_table[: src.shape[0]] = src
    # our mask token is row cardinality + 1; the reference keeps a separate
    # 1-row mask_embedding table substituted by token_mask (model.py:284)
    new_table[cardinality + 1] = sd["item_embedder.mask_embedding.weight"][0]
    body["embedder"][f"emb_{item_feature}"]["table"]["embedding"] = new_table
    d = src.shape[1]
    dh = d // num_heads

    if "item_embedder.position.pe.weight" in sd:
        body["pos"]["pos_table"]["embedding"] = sd["item_embedder.position.pe.weight"]

    i = 0
    while f"transformer_blocks.{i}.attention.in_proj_weight" in sd:
        layer = body[f"layer_{i}"]
        in_w = sd[f"transformer_blocks.{i}.attention.in_proj_weight"]
        in_b = sd[f"transformer_blocks.{i}.attention.in_proj_bias"]
        for j, name in enumerate(("query", "key", "value")):
            layer["attn"][name]["kernel"] = in_w[j * d:(j + 1) * d].T.reshape(d, num_heads, dh)
            layer["attn"][name]["bias"] = in_b[j * d:(j + 1) * d].reshape(num_heads, dh)
        out_w = sd[f"transformer_blocks.{i}.attention.out_proj.weight"]
        layer["attn"]["out"]["kernel"] = out_w.T.reshape(num_heads, dh, d)
        layer["attn"]["out"]["bias"] = sd[f"transformer_blocks.{i}.attention.out_proj.bias"]
        layer["ln_attn"]["scale"] = sd[f"transformer_blocks.{i}.attention_norm.weight"]
        layer["ln_attn"]["bias"] = sd[f"transformer_blocks.{i}.attention_norm.bias"]
        layer["ln_ffn"]["scale"] = sd[f"transformer_blocks.{i}.pff_norm.weight"]
        layer["ln_ffn"]["bias"] = sd[f"transformer_blocks.{i}.pff_norm.bias"]
        layer["ffn"]["fc1"]["kernel"] = sd[f"transformer_blocks.{i}.pff.w_1.weight"].T
        layer["ffn"]["fc1"]["bias"] = sd[f"transformer_blocks.{i}.pff.w_1.bias"]
        layer["ffn"]["fc2"]["kernel"] = sd[f"transformer_blocks.{i}.pff.w_2.weight"].T
        layer["ffn"]["fc2"]["bias"] = sd[f"transformer_blocks.{i}.pff.w_2.bias"]
        i += 1

    if "_head.linear.weight" in sd:  # untied ClassificationHead (default)
        params["head_kernel"] = sd["_head.linear.weight"]
        params["out_bias"] = sd["_head.linear.bias"]
    elif "_head.out_bias" in sd:  # EmbeddingTyingHead
        params["out_bias"] = sd["_head.out_bias"]
    return params


def bert4rec_from_torch(schema, state_dict: Dict, max_sequence_length: int,
                        num_blocks: int, num_heads: int,
                        dtype: Optional[str] = "float32"):
    """Build the reference-exact flax Bert4Rec and load a torch checkpoint.

    The reference applies no input/final LayerNorm (torch LN eps 1e-5 inside
    blocks), gelu FFN, and by default an UNTIED ClassificationHead with a
    per-item bias; all reproduced here.
    :returns: (model, variables).
    """
    import jax

    from replay_tpu.nn.sequential.bert4rec import Bert4Rec

    item_name = schema.item_id_feature_name
    info = schema[item_name]
    sd_keys = set(state_dict)
    untied = any(k.startswith("_head.linear.") for k in sd_keys)
    w1 = next(v for k, v in state_dict.items() if k.endswith("pff.w_1.weight"))
    hidden_dim = int(np.shape(_np(w1))[0])
    model = Bert4Rec(
        schema=schema,
        max_sequence_length=max_sequence_length,
        num_blocks=num_blocks,
        num_heads=num_heads,
        hidden_dim=hidden_dim,
        dropout_rate=0.0,
        use_input_norm=False,
        use_final_norm=False,
        layer_norm_eps=1e-5,
        activation="gelu",
        use_out_bias=True,
        tie_weights=not untied,
        dtype=dtype,
    )
    batch = {
        "item_id": np.zeros((1, max_sequence_length), np.int32),
        "padding_mask": np.ones((1, max_sequence_length), np.int8),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    variables = dict(variables)
    variables["params"] = bert4rec_params_from_torch(
        state_dict, variables["params"], num_heads, info.cardinality,
        item_feature=item_name,
    )
    return model, variables
