"""Host input pipeline: threaded prefetch feeding device batches.

Replaces the reference's ``DataLoader(num_workers=32)`` fork-per-worker
model (reference: train_pet_cnn.py:155-164) with a thread pool that decodes
NIfTI files (pure numpy, releases the GIL in zlib/IO) and a bounded
prefetch queue of ready numpy batches. Device transfer happens once per
batch via ``jax.device_put`` (optionally with a NamedSharding so each batch
lands pre-sharded across the data-parallel mesh); all normalization math
runs on-device (see MultiModalDataset.get_device_preprocess).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np


def collate(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into one numpy batch dict."""
    keys = samples[0].keys()
    batch = {}
    for k in keys:
        vals = [s[k] for s in samples]
        batch[k] = np.stack(vals) if np.ndim(vals[0]) else np.asarray(vals)
    return batch


class DataLoader:
    """Minimal epoch iterator: shuffle, batch, threaded decode, prefetch.

    Args:
      dataset: indexable with __len__ (MultiModalDataset).
      batch_size: per-step GLOBAL batch size.
      shuffle: reshuffle indices each epoch (numpy RNG, seeded).
      drop_last: drop the trailing partial batch (the reference uses
        drop_last=True for some fusion loaders, train_pet_tabular_fusion
        .py:166); also keeps shapes static for jit.
      num_workers: decode threads; None (default) = min(8, cpu_count).
        Threads beyond the core count only help hide IO latency (gzip
        inflate is CPU-bound), so the default follows the host.
      prefetch: max ready batches in flight.
      sharding: optional jax.sharding.Sharding applied at device_put.
      pad_last: when not dropping, zero-pad the trailing batch to full size
        and add a 'sample_mask' key. Default False: the trailing partial
        batch is yielded as-is (costs one extra jit specialization; keeps
        metric semantics exact, matching the reference's loaders).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int | None = None,
                 prefetch: int = 2, seed: int = 0,
                 sharding=None, pad_last: bool = False,
                 device_put: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        if num_workers is None:
            num_workers = min(8, os.cpu_count() or 1)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.sharding = sharding
        self.pad_last = pad_last
        self.device_put = device_put
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches_of_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        end = (len(idx) // self.batch_size * self.batch_size
               if self.drop_last else len(idx))
        for start in range(0, end, self.batch_size):
            yield idx[start:start + self.batch_size]

    def _load_batch(self, indices, pool) -> dict:
        samples = list(pool.map(self.dataset.__getitem__, indices))
        batch = collate(samples)
        n = len(indices)
        if n < self.batch_size and self.pad_last:
            pad = self.batch_size - n
            batch = {k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                for k, v in batch.items()}
            mask = np.zeros(self.batch_size, np.float32)
            mask[:n] = 1.0
            batch["sample_mask"] = mask
        elif self.pad_last:
            batch["sample_mask"] = np.ones(self.batch_size, np.float32)
        return batch

    def __iter__(self) -> Iterator[dict]:
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def producer():
            try:
                for indices in self._batches_of_indices():
                    if stop.is_set():
                        break
                    out_q.put(self._load_batch(indices, pool))
            except RuntimeError:
                pass  # pool shut down by an abandoned iterator
            finally:
                out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if self.device_put:
                    import jax

                    item = (jax.device_put(item, self.sharding)
                            if self.sharding is not None
                            else jax.device_put(item))
                yield item
        finally:
            stop.set()
            # drain so a blocked producer put() can observe the stop flag
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
            pool.shutdown(wait=False)
