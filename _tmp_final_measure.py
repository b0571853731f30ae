"""(a) ML-20M-catalog headline with the new kernels; (b) k_disp=8 variant."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
import numpy as np
import bench as B
import jax, jax.numpy as jnp

# (a) ML-20M catalog
B.N_ITEMS = 26744
v = B.bench_jax()
print(f"ML-20M catalog (26744 items): {v:.0f} ex/s", flush=True)
B.N_ITEMS = 3706

# (b) k_disp: scan 8 steps per dispatch at the headline catalog
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
                                       steps_per_dispatch=8),
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
group = trainer._place_stacked([batch] * 8)
key = jax.random.PRNGKey(0)
state = trainer.state
state, stats = multi(state, group, key, 0)
float(stats["loss"][-1])
t0 = time.perf_counter()
n_disp = 4
for i in range(n_disp):
    state, stats = multi(state, group, key, 8 * (i + 1))
float(stats["loss"][-1])
dt = time.perf_counter() - t0
print(f"k_disp=8: {B.BATCH * 8 * n_disp / dt:.0f} ex/s ({dt / (8 * n_disp) * 1e3:.2f} ms/step)", flush=True)
