"""Batched, host-sharded, prefetching data loading.

Replaces the reference's torch DataLoader + DistributedSampler stack
(`/root/reference/dro_sfm/models/model_wrapper.py:811-849`) with a
numpy-native loader designed for the JAX multi-host model:

* every host sees a disjoint shard of the epoch's (shuffled) index list —
  the role of `DistributedSampler` (`model_wrapper.py:818-823`);
* workers are a thread pool (dataset __getitem__ is IO/numpy bound and
  releases the GIL in cv2/np), with a bounded prefetch queue;
* train batches drop the remainder (static shapes for jit); eval batches pad
  the tail and carry an explicit validity mask, which downstream metric
  reduction honors — the TPU-friendly version of the reference's
  "all samples seen" accounting (`utils/reduce.py:32-83`).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from dro_sfm_tpu.data.base import Dataset, set_dataset_epoch

_ARRAY_KEYS = ("rgb", "rgb_original", "rgb_context", "rgb_context_original",
               "intrinsics", "depth", "pose_context")


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack sample dicts into a batch dict (+ ``idx`` [B] and ``filename``)."""
    batch: Dict[str, np.ndarray] = {}
    for key in _ARRAY_KEYS:
        if key in samples[0]:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples])
    batch["idx"] = np.array([s["idx"] for s in samples], dtype=np.int64)
    batch["filename"] = [s["filename"] for s in samples]
    return batch


class RepeatedDataset:
    """Repeat a dataset R times per epoch (`model_wrapper.py` repeat /
    `configs/overfit_kitti_mf_gt.yaml` repeat: [100])."""

    def __init__(self, dataset: Dataset, repeat: int):
        self.dataset = dataset
        self.repeat = repeat

    def __len__(self):
        return len(self.dataset) * self.repeat

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]


class ConcatDataset:
    """Concatenate datasets (train multi-dataset support,
    `model_wrapper.py:105-130`)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[d][idx - int(self._offsets[d])]


class DataLoader:
    """Iterable over collated numpy batches.

    Parameters
    ----------
    drop_last : keep shapes static for jitted train steps. When False, the
        final partial batch is padded by repeating its last sample and the
        batch carries ``valid`` [B] marking real entries.
    num_shards / shard_id : host sharding (jax.process_count/index).
    """

    def __init__(self, dataset: Dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = True,
                 num_shards: int = 1, shard_id: int = 0, seed: int = 42,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (`horovod_trainer.py:97-98` set_epoch) and
        refresh per-sample augmentation RNG streams."""
        self.epoch = epoch
        set_dataset_epoch(self.dataset, epoch)

    def _epoch_indices(self) -> np.ndarray:
        return self._epoch_indices_and_validity()[0]

    def _epoch_indices_and_validity(self):
        """This host's sample indices plus a mask of genuine (non-padding)
        entries.

        Shards are padded to equal size by duplicating leading samples, but
        duplicates are marked invalid so distributed eval counts every
        dataset sample exactly once (the reference dedupes gathered
        per-sample metrics by idx, `utils/reduce.py:63-71`; here validity
        masking does the same without the gather).
        """
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + self.epoch).permutation(n)
        # Pad so every shard sees the same number of samples, then shard.
        per_shard = -(-n // self.num_shards)
        padded = np.concatenate([order, order[:per_shard * self.num_shards - n]])
        genuine = np.arange(len(padded)) < n
        sl = slice(self.shard_id, None, self.num_shards)
        return padded[sl], genuine[sl]

    def __len__(self) -> int:
        # Shard length is epoch-independent: ceil(n / num_shards) samples per
        # shard (no need to materialize the O(n) epoch permutation — __len__
        # runs on every progress line).
        per_shard = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices, genuine = self._epoch_indices_and_validity()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    sl = slice(b * self.batch_size, (b + 1) * self.batch_size)
                    chunk = indices[sl]
                    valid = np.ones(self.batch_size, dtype=bool)
                    valid[:len(chunk)] = genuine[sl]
                    if len(chunk) < self.batch_size:
                        valid[len(chunk):] = False
                        chunk = np.concatenate(
                            [chunk, np.full(self.batch_size - len(chunk),
                                            chunk[-1])])
                    samples = list(pool.map(self.dataset.__getitem__, chunk))
                    batch = collate(samples)
                    batch["valid"] = valid
                    out_q.put(batch)
            out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def device_prefetch(iterable, place_fn, depth: int = 2):
    """Overlap host->device transfer with compute: keep up to ``depth``
    batches placed on device ahead of the consumer.

    ``place_fn(batch) -> placed`` is dispatched eagerly (jax.device_put /
    make_array_from_process_local_data are asynchronous — they return
    immediately with transfers in flight), so while the train step for
    batch *i* executes on the TPU, batch *i+1*'s copy rides the PCIe/ICI
    concurrently instead of serializing in front of the next dispatch.
    Yields ``(batch, placed)`` pairs in order. The torch analogue is
    pinned-memory + non_blocking copies, which the reference's
    `sample_to_cuda` (`trainers/base_trainer.py:8-18`) never did.
    """
    from collections import deque

    buf = deque()
    it = iter(iterable)
    try:
        while True:
            while len(buf) < depth:
                batch = next(it)
                buf.append((batch, place_fn(batch)))
            yield buf.popleft()
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()


def make_loader(dataset: Dataset, batch_size: int, mode: str,
                num_workers: int = 4, seed: int = 42,
                num_shards: Optional[int] = None,
                shard_id: Optional[int] = None) -> DataLoader:
    """Build a loader with host sharding inferred from jax when available."""
    if num_shards is None or shard_id is None:
        try:
            import jax
            num_shards = jax.process_count()
            shard_id = jax.process_index()
        except Exception:
            num_shards, shard_id = 1, 0
    # More worker threads than cores is measurably NEGATIVE scaling (they
    # fight cv2's internal threading for the same cores; see
    # docs/perf_notes_r3.md loader section).
    import os
    num_workers = min(num_workers, os.cpu_count() or num_workers)
    return DataLoader(
        dataset, batch_size,
        shuffle=(mode == "train"),
        num_workers=num_workers,
        drop_last=(mode == "train"),
        num_shards=num_shards, shard_id=shard_id, seed=seed)
