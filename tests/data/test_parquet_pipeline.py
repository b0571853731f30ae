"""Parquet streaming pipeline tests (synthetic files, reference test pattern:
tests/data/nn/parquet/)."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.nn.parquet import (
    ColumnMeta,
    Metadata,
    ParquetDataset,
    ParquetModule,
    partitioning_length,
    partitioning_per_replica,
    replica_indices,
)
from replay_tpu.data.nn.parquet.info import ReplicasInfo, StaticInfo, curr_replica, num_replicas

N_ROWS = 257  # deliberately not divisible by batch size


@pytest.fixture(scope="module")
def parquet_file(tmp_path_factory):
    """Synthetic ragged-sequence parquet (reference conftest's sine-wave files)."""
    rng = np.random.default_rng(0)
    rows = []
    for i in range(N_ROWS):
        length = int(rng.integers(1, 12))
        rows.append(
            {
                "query_id": i,
                "item_id": [int(x) for x in rng.integers(0, 50, length)],
                "rating": [float(x) for x in rng.random(length)],
            }
        )
    frame = pd.DataFrame(rows)
    path = tmp_path_factory.mktemp("pq") / "data.parquet"
    frame.to_parquet(path)
    return str(path)


METADATA = Metadata(
    {
        "query_id": ColumnMeta(shape=(), dtype="int64"),
        "item_id": ColumnMeta(shape=(8,), padding=50, dtype="int32"),
        "rating": ColumnMeta(shape=(8,), padding=0.0, dtype="float32"),
    }
)


class TestPartitioning:
    def test_length_math(self):
        assert partitioning_length(10, 4) == 12
        assert partitioning_length(12, 4) == 12
        assert partitioning_per_replica(10, 4) == 3

    def test_replica_shards_tile_dataset(self):
        """Exhaustive check for 1..4 replicas (reference:
        tests/data/nn/parquet/partitioning/test_partitioning.py:92-132)."""
        for n in range(1, 5):
            seen = []
            for r in range(n):
                idx = replica_indices(10, r, n)
                assert len(idx) == partitioning_per_replica(10, n)
                seen.extend(idx.tolist())
            assert set(seen) == set(range(10))

    def test_replicas_info_mock(self):
        """Replica identity is a pure function of (worker, rank) — testable
        without processes, the reference's mock pattern."""
        info = ReplicasInfo(
            worker_info=StaticInfo(num_workers=2, worker_id=1),
            distributed_info=StaticInfo(rank=1, world_size=3),
        )
        assert info.num_replicas == 6
        assert info.curr_replica == 1 + 2 * 1


class TestParquetDataset:
    def test_static_shapes_and_masks(self, parquet_file):
        ds = ParquetDataset(
            parquet_file, METADATA, batch_size=32, replica_id=0, num_replicas=1
        )
        batches = list(ds)
        assert len(batches) == len(ds) == -(-N_ROWS // 32)
        for b in batches:
            assert b["item_id"].shape == (32, 8)
            assert b["item_id_mask"].shape == (32, 8)
            assert b["rating"].shape == (32, 8)
            assert b["query_id"].shape == (32,)
            # left padding: masks right-aligned
            m = b["item_id_mask"]
            assert np.all(np.diff(m, axis=1) >= 0)
        # final batch flags padding rows
        assert batches[-1]["batch_mask"].sum() == N_ROWS % 32

    def test_all_rows_served_once(self, parquet_file):
        ds = ParquetDataset(parquet_file, METADATA, batch_size=32, replica_id=0, num_replicas=1)
        ids = np.concatenate(
            [b["query_id"][b["batch_mask"].astype(bool)] for b in ds]
        )
        assert sorted(ids.tolist()) == list(range(N_ROWS))

    def test_replica_sharding_covers_dataset(self, parquet_file):
        seen = []
        for r in range(3):
            ds = ParquetDataset(
                parquet_file, METADATA, batch_size=16, replica_id=r, num_replicas=3
            )
            for b in ds:
                seen.extend(b["query_id"][b["batch_mask"].astype(bool)].tolist())
        assert set(seen) == set(range(N_ROWS))

    def test_deterministic_shuffle_per_epoch(self, parquet_file):
        def first_ids(epoch):
            ds = ParquetDataset(
                parquet_file, METADATA, batch_size=16, shuffle=True, seed=3,
                replica_id=0, num_replicas=1,
            )
            ds.set_epoch(epoch)
            return next(iter(ds))["query_id"].tolist()

        assert first_ids(0) == first_ids(0)
        assert first_ids(0) != first_ids(1)

    def test_truncates_long_sequences_keeping_tail(self, tmp_path):
        frame = pd.DataFrame({"query_id": [0], "item_id": [list(range(20))]})
        path = tmp_path / "one.parquet"
        frame.to_parquet(path)
        meta = Metadata(
            {
                "query_id": ColumnMeta(),
                "item_id": ColumnMeta(shape=(8,), padding=-1, dtype="int32"),
            }
        )
        ds = ParquetDataset(str(path), meta, batch_size=1, replica_id=0, num_replicas=1)
        batch = next(iter(ds))
        np.testing.assert_array_equal(batch["item_id"][0], np.arange(12, 20))


class TestParquetModule:
    def test_module_feeds_trainer(self, parquet_file):
        from replay_tpu.data.nn.schema import (
            TensorFeatureInfo,
            TensorFeatureSource,
            TensorFeatureType,
            TensorSchema,
        )
        from replay_tpu.data.schema import FeatureHint, FeatureSource
        from replay_tpu.nn.losses import CESampledLoss
        from replay_tpu.nn.sequential.sasrec import SasRec
        from replay_tpu.nn.training import Trainer, TrainerConfig
        from replay_tpu.nn.transforms import Compose, NextTokenTransform, RenameTransform

        schema = TensorSchema(
            TensorFeatureInfo(
                "item_id",
                TensorFeatureType.CATEGORICAL,
                is_seq=True,
                feature_hint=FeatureHint.ITEM_ID,
                feature_sources=[TensorFeatureSource(FeatureSource.INTERACTIONS, "item_id")],
                cardinality=50,
                embedding_dim=16,
                padding_value=50,
            )
        )
        module = ParquetModule(
            metadata=Metadata(
                {
                    "query_id": ColumnMeta(),
                    "item_id": ColumnMeta(shape=(9,), padding=50, dtype="int32"),
                }
            ),
            train_path=parquet_file,
            batch_size=32,
            transforms={"train": RenameTransform({"item_id_mask": "padding_mask"})},
            replica_id=0,
            num_replicas=1,
        )
        model = SasRec(schema=schema, max_sequence_length=8, num_blocks=1, num_heads=2)
        trainer = Trainer(
            model,
            CESampledLoss(8),
            transform=NextTokenTransform(),
            config=TrainerConfig(max_epochs=2, batch_size=32, max_sequence_length=8),
        )
        history = trainer.fit_loader(module)
        assert len(history) == 2
        assert all(np.isfinite(h["loss"]) for h in history)


class Test2DColumnsAndPrefetch:
    def _write_2d(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(4)
        rows = []
        for _ in range(100):
            n_outer = int(rng.integers(1, 7))
            rows.append(
                [rng.integers(0, 50, int(rng.integers(1, 5))).tolist() for _ in range(n_outer)]
            )
        path = str(tmp_path / "twod.parquet")
        pq.write_table(
            pa.table({
                "query_id": pa.array(np.arange(100)),
                "cats": pa.array(rows, type=pa.list_(pa.list_(pa.int64()))),
            }),
            path,
        )
        return path, rows

    def test_vectorized_2d_matches_python_pad(self, tmp_path):
        """The vectorized 2-D gather must reproduce pad_column's per-row
        semantics (outer left-pad keep-tail, inner truncate-first/right-pad;
        reference impl/array_2d_column.py)."""
        from replay_tpu.data.nn.parquet.metadata import ColumnMeta, pad_column

        path, rows = self._write_2d(tmp_path)
        meta = Metadata({
            "query_id": ColumnMeta(shape=(), dtype="int64"),
            "cats": ColumnMeta(shape=(4, 3), padding=-1, dtype="int32"),
        })
        ds = ParquetDataset(path, meta, batch_size=100, shuffle=False)
        batch = next(iter(ds))
        expect_arr, expect_mask = pad_column(rows, meta["cats"])
        np.testing.assert_array_equal(batch["cats"], expect_arr)
        np.testing.assert_array_equal(batch["cats_mask"], expect_mask)

    def test_2d_with_shuffle_and_batching(self, tmp_path):
        path, rows = self._write_2d(tmp_path)
        meta = Metadata({
            "query_id": ColumnMeta(shape=(), dtype="int64"),
            "cats": ColumnMeta(shape=(4, 3), padding=-1, dtype="int32"),
        })
        from replay_tpu.data.nn.parquet.metadata import pad_column

        ds = ParquetDataset(path, meta, batch_size=16, shuffle=True, seed=3)
        seen = set()
        for b in ds:
            real = b["batch_mask"].astype(bool)
            for qid, mat in zip(b["query_id"][real], b["cats"][real]):
                seen.add(int(qid))
                expect, _ = pad_column([rows[int(qid)]], meta["cats"])
                np.testing.assert_array_equal(mat, expect[0])
        assert seen == set(range(100))

    def test_prefetch_yields_identical_batches(self, parquet_file):
        meta = Metadata({
            "query_id": ColumnMeta(shape=(), dtype="int64"),
            "item_id": ColumnMeta(shape=(8,), padding=50, dtype="int32"),
            "rating": ColumnMeta(shape=(8,), padding=0.0, dtype="float32"),
        })
        sync = list(ParquetDataset(parquet_file, meta, batch_size=32, shuffle=True, seed=1))
        pre = list(ParquetDataset(parquet_file, meta, batch_size=32, shuffle=True, seed=1, prefetch=3))
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_prefetch_propagates_errors(self, tmp_path):
        from replay_tpu.data.nn.parquet.parquet_dataset import _PrefetchIterator

        def boom():
            yield 1
            raise RuntimeError("producer died")

        it = _PrefetchIterator(boom, depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="producer died"):
            next(it)


class TestMultiWorkerLoading:
    def test_workers_cover_dataset_disjointly(self, parquet_file):
        meta = Metadata({
            "query_id": ColumnMeta(shape=(), dtype="int64"),
            "item_id": ColumnMeta(shape=(8,), padding=50, dtype="int32"),
            "rating": ColumnMeta(shape=(8,), padding=0.0, dtype="float32"),
        })
        single = ParquetDataset(parquet_file, meta, batch_size=16)
        base_ids = []
        for b in single:
            base_ids.extend(b["query_id"][b["batch_mask"].astype(bool)].tolist())

        multi = ParquetDataset(parquet_file, meta, batch_size=16, num_workers=3)
        got = []
        for b in multi:
            got.extend(b["query_id"][b["batch_mask"].astype(bool)].tolist())
        # replica padding may duplicate a few head rows; every base row served
        assert set(got) >= set(base_ids)
        assert len(got) >= len(base_ids)

    def test_worker_merge_is_deterministic(self, parquet_file):
        meta = Metadata({
            "query_id": ColumnMeta(shape=(), dtype="int64"),
            "item_id": ColumnMeta(shape=(8,), padding=50, dtype="int32"),
            "rating": ColumnMeta(shape=(8,), padding=0.0, dtype="float32"),
        })
        def run():
            ds = ParquetDataset(parquet_file, meta, batch_size=16,
                                shuffle=True, seed=5, num_workers=2)
            return [b["query_id"].tolist() for b in ds]

        assert run() == run()

    def test_worker_composes_with_replicas(self, parquet_file):
        """worker (w, K) × replica (r, W) = sub-replica (w + K·r, K·W):
        2 replicas × 2 workers must tile like 4 flat replicas."""
        meta = Metadata({"query_id": ColumnMeta(shape=(), dtype="int64"),
                        "item_id": ColumnMeta(shape=(8,), padding=50, dtype="int32"),
                        "rating": ColumnMeta(shape=(8,), padding=0.0, dtype="float32")})
        composed = []
        for r in range(2):
            ds = ParquetDataset(parquet_file, meta, batch_size=16,
                                replica_id=r, num_replicas=2, num_workers=2)
            for b in ds:
                composed.extend(b["query_id"][b["batch_mask"].astype(bool)].tolist())
        flat = []
        for sub in range(4):
            ds = ParquetDataset(parquet_file, meta, batch_size=16,
                                replica_id=sub, num_replicas=4)
            for b in ds:
                flat.extend(b["query_id"][b["batch_mask"].astype(bool)].tolist())
        assert sorted(composed) == sorted(flat)


class TestReviewFindings:
    """Round-2 review regressions: len() with workers, prefetch abandonment."""

    def _meta(self):
        return Metadata({
            "query_id": ColumnMeta(shape=(), dtype="int64"),
            "item_id": ColumnMeta(shape=(8,), padding=50, dtype="int32"),
            "rating": ColumnMeta(shape=(8,), padding=0.0, dtype="float32"),
        })

    def test_len_accounts_for_workers(self, parquet_file):
        for workers in [0, 2, 3]:
            for drop_last in [False, True]:
                ds = ParquetDataset(parquet_file, self._meta(), batch_size=16,
                                    num_workers=workers, drop_last=drop_last)
                assert len(ds) == sum(1 for _ in ds), (workers, drop_last)

    def test_abandoned_prefetch_releases_producer(self, parquet_file):
        import threading

        before = threading.active_count()
        ds = ParquetDataset(parquet_file, self._meta(), batch_size=8, prefetch=2)
        it = iter(ds)
        next(it)  # consume one batch, then abandon
        it.close()
        import time

        deadline = time.time() + 5
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_abandoned_worker_merge_releases_threads(self, parquet_file):
        import threading
        import time

        before = threading.active_count()
        ds = ParquetDataset(parquet_file, self._meta(), batch_size=8, num_workers=2)
        gen = iter(ds)
        next(gen)
        gen.close()  # generator finally closes worker streams
        deadline = time.time() + 5
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before


class TestReferenceHookSurface:
    def test_compute_length_matches_len(self, parquet_file):
        ds = ParquetDataset(parquet_file, METADATA, batch_size=32, replica_id=0, num_replicas=1)
        assert ds.compute_length() == len(ds) == len(list(iter(ds)))

    def test_datamodule_hooks(self, parquet_file):
        calls = []
        module = ParquetModule(
            metadata=METADATA,
            train_path=parquet_file,
            validation_path=parquet_file,
            test_path=parquet_file,
            batch_size=32,
            transforms={"train": lambda b: (calls.append(1), b)[1]},
        )
        module.setup("fit")
        module.prepare_transforms()
        train_batches = list(module.train_dataloader())
        assert len(train_batches) == len(module.dataset("train"))
        # second call advances the shuffle epoch
        second = list(module.train_dataloader())
        assert not np.array_equal(train_batches[0]["query_id"], second[0]["query_id"])
        val = next(iter(module.val_dataloader()))
        assert "item_id_mask" in val
        batch = module.transfer_batch_to_device(val)
        assert batch is val
        out = module.on_after_batch_transfer(val)
        assert calls and out is val
