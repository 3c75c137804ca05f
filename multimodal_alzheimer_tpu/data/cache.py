"""Decoded-volume cache: one-time gzip decode, then OS-page-cache mmap.

The reference re-decodes every NIfTI with nibabel in every epoch across 32
worker processes (reference: pkg/utils/dataloader.py:206, 228). gzip
inflate is ~20 ms/volume of pure CPU — on few-core hosts it becomes the
training bottleneck. This cache decodes each volume once to a raw ``.npy``
and serves later epochs via ``np.load(mmap_mode='r')``: after the first
epoch, reads come from the OS page cache at memory bandwidth with zero
decode CPU.

Cache keys include file path, size and mtime, so stale entries self-evict.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np


class VolumeCache:
    def __init__(self, cache_dir: str | Path):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)

    def _key(self, path: str) -> Path:
        st = os.stat(path)
        token = f"{os.path.abspath(path)}|{st.st_size}|{int(st.st_mtime)}"
        digest = hashlib.sha1(token.encode()).hexdigest()[:24]
        return self.cache_dir / f"{digest}.npy"

    def get(self, path: str) -> np.ndarray:
        """Decoded float32 volume; memory-mapped on cache hits."""
        entry = self._key(path)
        if entry.exists():
            return np.load(entry, mmap_mode="r")
        from multimodal_alzheimer_tpu.data import native_io

        volume = np.ascontiguousarray(native_io.decode(path))
        tmp = entry.with_suffix(".tmp.npy")
        np.save(tmp, volume)
        os.replace(tmp, entry)  # atomic vs concurrent writers
        return volume
