import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
import numpy as np
import bench as B
import jax, jax.numpy as jnp
from replay_tpu.data.nn.schema import (TensorFeatureInfo, TensorFeatureSource, TensorFeatureType, TensorSchema)
from replay_tpu.data.schema import FeatureHint, FeatureSource
from replay_tpu.nn.sequential.sasrec import SasRec
from replay_tpu.nn.tiled_ce import CELossTiled
from replay_tpu.nn.training import OptimizerFactory, Trainer, TrainerConfig
from replay_tpu.nn.transforms import NextTokenTransform
from replay_tpu.parallel import make_mesh

schema = TensorSchema(TensorFeatureInfo(
    "item_id", TensorFeatureType.CATEGORICAL, is_seq=True,
    feature_hint=FeatureHint.ITEM_ID,
    feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
    cardinality=B.N_ITEMS, embedding_dim=B.DIM, padding_value=B.N_ITEMS))
model = SasRec(schema=schema, max_sequence_length=B.SEQ_LEN, num_blocks=B.BLOCKS, num_heads=B.HEADS)
trainer = Trainer(model, CELossTiled(tile=2048, impl="auto"),
                  optimizer=OptimizerFactory(1e-3), transform=NextTokenTransform(),
                  config=TrainerConfig(batch_size=B.BATCH, max_sequence_length=B.SEQ_LEN,
                                       steps_per_dispatch=4),
                  mesh=make_mesh())
rng = np.random.default_rng(0)
batch = {
    "item_id": rng.integers(0, B.N_ITEMS, (B.BATCH, B.SEQ_LEN + 1)).astype(np.int32),
    "padding_mask": np.ones((B.BATCH, B.SEQ_LEN + 1), dtype=np.int8),
    "batch_mask": np.ones(B.BATCH, dtype=np.int8),
    "query_id": np.arange(B.BATCH, dtype=np.int64),
    "seq_len": np.full(B.BATCH, B.SEQ_LEN + 1, dtype=np.int32),
}
trainer.init_state(batch)
multi = trainer._build_train_multistep()

t0 = time.perf_counter(); group = trainer._place_stacked([batch] * 4)
jax.block_until_ready(group); print(f"place_stacked: {time.perf_counter()-t0:.2f}s", flush=True)
print("group leaf type/sharding:", type(jax.tree_util.tree_leaves(group)[0]),
      jax.tree_util.tree_leaves(group)[0].sharding, flush=True)

key = jax.random.PRNGKey(0)
state = trainer.state
for i in range(4):
    t0 = time.perf_counter()
    state, stats = multi(state, group, key, 4 * i)
    enq = time.perf_counter() - t0
    l = float(stats["loss"][-1])
    print(f"dispatch {i}: enqueue {enq*1e3:.0f} ms, total {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
print("cache size:", multi._cache_size(), flush=True)

# signature diff: which state leaf changed dtype/sharding/commitment?
trainer.init_state(batch)
s0 = trainer.state
s1, _ = multi(s0, group, key, 0)
import jax.tree_util as jtu
p0 = jtu.tree_flatten_with_path(s0)[0]
p1 = jtu.tree_flatten_with_path(s1)[0]
for (k0, a0), (k1, a1) in zip(p0, p1):
    d0 = (a0.dtype, getattr(a0, "sharding", None), getattr(a0, "committed", None)) if hasattr(a0, "dtype") else (type(a0),)
    d1 = (a1.dtype, getattr(a1, "sharding", None), getattr(a1, "committed", None)) if hasattr(a1, "dtype") else (type(a1),)
    if d0 != d1:
        print("DIFF", jtu.keystr(k0), "\n  in :", d0, "\n  out:", d1, flush=True)
print("sig diff done", flush=True)
