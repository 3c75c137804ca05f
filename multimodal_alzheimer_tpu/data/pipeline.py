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
    return collate_into(samples, None)


def collate_into(samples: Sequence[dict], out: dict | None) -> dict:
    """Collate, writing into preallocated buffers where shapes match.

    ``np.stack`` allocates a fresh batch buffer every call; on
    para-virtualized hosts fresh page allocation can run ~1000x slower
    than the copy itself (tools/bench_host.py: 3.8 GB/s steady vs 4 MB/s
    fresh on the round-2 VM), so the loader reuses batch buffers. ``out``
    adopts full-size buffers lazily on first use; a trailing ragged batch
    gets fresh arrays without evicting the adopted ones.
    """
    batch = {}
    for k in samples[0].keys():
        vals = [np.asarray(s[k]) for s in samples]
        shape = (len(vals),) + vals[0].shape
        dtype = vals[0].dtype
        if out is not None and k in out and out[k].shape == shape \
                and out[k].dtype == dtype:
            buf = out[k]
        else:
            buf = np.empty(shape, dtype)
            if out is not None and k not in out:
                out[k] = buf
        for i, v in enumerate(vals):
            buf[i, ...] = v
        batch[k] = buf
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

    With ``device_put`` (the default), the transfer happens on the
    producer thread — H2D overlaps training compute and the host batch
    buffers are recycled once their transfer completes (at most
    ``prefetch`` device batches in flight beyond the one training on;
    raw f32 volumes are large, so size ``prefetch`` to HBM headroom).
    Buffer recycling is alias-safe: TPU/remote transfers always copy, but
    JAX's CPU backend zero-copy-aliases suitably-aligned numpy arrays
    (observed live: alignment-dependent, so some batches alias and some
    don't) — on CPU targets every leaf is checked with
    ``np.shares_memory`` after the transfer and aliased buffers are
    dropped from the pool instead of recycled.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int | None = None,
                 prefetch: int = 2, seed: int = 0,
                 sharding=None, pad_last: bool = False,
                 device_put: bool = True):
        self.dataset = dataset
        if batch_size < 1:
            raise ValueError(
                f"batch_size must be >= 1, got {batch_size} (an empty "
                f"dataset split? len(dataset)={len(dataset)})")
        if drop_last and len(dataset) < batch_size:
            # Without this, the epoch yields ZERO batches and the failure
            # surfaces later as a cryptic empty-concatenate inside the
            # trainer's metric accumulation.
            raise ValueError(
                f"drop_last=True with len(dataset)={len(dataset)} < "
                f"batch_size={batch_size} yields zero batches per epoch")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        if num_workers is None:
            num_workers = min(8, os.cpu_count() or 1)
        self.num_workers = max(1, num_workers)
        if prefetch < 1:
            raise ValueError("prefetch must be >= 1")
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

    def _load_batch(self, indices, pool, bufs=None) -> dict:
        samples = list(pool.map(self.dataset.__getitem__, indices))
        batch = collate_into(samples, bufs)
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
        from collections import deque

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        reuse = self.device_put  # consumer never sees the numpy buffers
        free_q: queue.Queue = queue.Queue()
        for _ in range(self.prefetch + 1):
            free_q.put({})

        def to_device(batch):
            import jax

            return (jax.device_put(batch, self.sharding)
                    if self.sharding is not None
                    else jax.device_put(batch))

        def recycle(bufs, dev):
            """Return buffers to the pool; drop any the backend aliased.

            jax's CPU backend zero-copies aligned numpy arrays into
            device_put results — recycling such a buffer would mutate the
            live batch. Probed per addressable shard: with a multi-device
            CPU sharding ``np.asarray(arr)`` gathers shards into a FRESH
            buffer (shares_memory False) even when individual shards
            zero-copy-alias slices of the host buffer, so the whole-array
            probe would wrongly recycle live memory. Each shard's
            ``np.asarray(s.data)`` is a zero-copy view on CPU, so the
            probe is pointer math, not a copy; non-CPU backends never
            alias (data crossed to the device).
            """
            import jax

            if jax.devices()[0].platform == "cpu":
                for k in list(bufs):
                    if k in dev and any(
                            np.shares_memory(np.asarray(s.data), bufs[k])
                            for s in dev[k].addressable_shards):
                        del bufs[k]
            free_q.put(bufs)

        error: list = []  # producer exception, re-raised in the consumer

        def producer():
            import jax

            pending: deque = deque()  # (bufs, device batch) in flight
            try:
                for indices in self._batches_of_indices():
                    if stop.is_set():
                        break
                    if not reuse:
                        out_q.put(self._load_batch(indices, pool))
                        continue
                    while pending and len(pending) >= self.prefetch:
                        old_bufs, old_dev = pending.popleft()
                        jax.block_until_ready(old_dev)  # transfer done
                        recycle(old_bufs, old_dev)
                    bufs = free_q.get()
                    dev = to_device(self._load_batch(indices, pool, bufs))
                    pending.append((bufs, dev))
                    out_q.put(dev)
            except BaseException as exc:
                # torch-DataLoader parity: a worker/decode failure must
                # surface in the training process, not truncate the epoch
                # (a clean-looking short epoch silently corrupts metrics
                # and gradients). Swallow only the shutdown race of an
                # abandoned iterator.
                if not stop.is_set():
                    error.append(exc)
            finally:
                out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    break
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
