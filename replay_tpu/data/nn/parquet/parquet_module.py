"""ParquetModule: per-split streaming config for the Trainer.

TPU-native analog of the reference's LightningDataModule wrapper
(reference: replay/data/nn/parquet/parquet_module.py:19).  Bundles
train/validation/test parquet paths, batch sizes, metadata, and per-split
batch transforms; the Trainer consumes it through ``loader(split, epoch)``.
Transforms here are the pure-jnp transforms of replay_tpu.nn.transforms —
they are applied inside the jitted train step, the analog of the
reference's on-device ``on_after_batch_transfer``.
"""

from typing import Callable, Dict, Iterator, Optional, Sequence, Union

from replay_tpu.data.nn.parquet.metadata import Metadata
from replay_tpu.data.nn.parquet.parquet_dataset import Batch, ParquetDataset


class ParquetModule:
    """Split-aware factory of streaming parquet iterators."""

    def __init__(
        self,
        metadata: Union[Metadata, Dict],
        train_path: Optional[str] = None,
        validation_path: Union[str, Sequence[str], None] = None,
        test_path: Optional[str] = None,
        batch_size: int = 128,
        val_batch_size: Optional[int] = None,
        partition_size: int = 65536,
        shuffle_train: bool = True,
        seed: int = 0,
        transforms: Optional[Dict[str, Callable]] = None,
        replica_id: Optional[int] = None,
        num_replicas: Optional[int] = None,
        prefetch: int = 0,
    ):
        if isinstance(metadata, dict):
            metadata = Metadata.from_dict(metadata)
        self.metadata = metadata
        self.paths = {
            "train": train_path,
            "validation": validation_path,
            "test": test_path,
        }
        self.batch_size = batch_size
        self.val_batch_size = val_batch_size or batch_size
        self.partition_size = partition_size
        self.shuffle_train = shuffle_train
        self.seed = seed
        self.transforms = transforms or {}
        self.prefetch = prefetch
        self._replica = (replica_id, num_replicas)
        self._datasets: Dict[str, ParquetDataset] = {}
        self._hook_epochs: Dict[str, int] = {}

    def dataset(self, split: str) -> ParquetDataset:
        if split not in self._datasets:
            path = self.paths.get(split)
            if path is None:
                msg = f"No path configured for split '{split}'"
                raise ValueError(msg)
            self._datasets[split] = ParquetDataset(
                path,
                metadata=self.metadata,
                batch_size=self.batch_size if split == "train" else self.val_batch_size,
                partition_size=self.partition_size,
                shuffle=self.shuffle_train and split == "train",
                seed=self.seed,
                replica_id=self._replica[0],
                num_replicas=self._replica[1],
                prefetch=self.prefetch,
            )
        return self._datasets[split]

    def loader(self, split: str, epoch: int = 0) -> Iterator[Batch]:
        """Batches for one epoch of a split (host-side numpy dicts)."""
        ds = self.dataset(split)
        ds.set_epoch(epoch)
        return iter(ds)

    def transform_for(self, split: str) -> Optional[Callable]:
        return self.transforms.get(split)

    # -- reference LightningDataModule hook names ---------------------------
    # (reference: replay/data/nn/parquet/parquet_module.py:149-199).  The
    # Trainer drives loader()/transform_for() directly, but the upstream hook
    # spellings work too so datamodule-style code ports unchanged.  Each
    # *_dataloader() yields one epoch and advances an internal epoch counter
    # for the shuffle stream (Lightning calls it once per epoch).

    def setup(self, stage: Optional[str] = None) -> None:  # noqa: ARG002
        """Materialize the datasets for every configured split."""
        for split, path in self.paths.items():
            if path is not None:
                self.dataset(split)

    def prepare_transforms(self, device=None) -> None:  # noqa: ARG002
        """No-op: transforms are pure jnp functions applied inside the jitted
        step; there is no device-residency to prepare."""

    def train_dataloader(self) -> Iterator[Batch]:
        epoch = self._hook_epochs.get("train", 0)
        self._hook_epochs["train"] = epoch + 1
        return self.loader("train", epoch)

    def val_dataloader(self) -> Iterator[Batch]:
        return self.loader("validation", 0)

    def test_dataloader(self) -> Iterator[Batch]:
        return self.loader("test", 0)

    def predict_dataloader(self) -> Iterator[Batch]:
        return self.loader("test", 0)

    def transfer_batch_to_device(self, batch: Batch, device=None, dataloader_idx: int = 0) -> Batch:  # noqa: ARG002
        """Host numpy batches are device_put by the jitted step itself; kept
        for hook-name parity (reference parquet_module.py:197)."""
        return batch

    def on_after_batch_transfer(self, batch: Batch, _dataloader_idx: int = 0) -> Batch:
        """Apply the train transform pipeline (the reference applies its
        nn.Sequential of transforms here, parquet_module.py:191-194)."""
        pre = self.transform_for("train")
        return pre(batch) if pre is not None else batch
