"""Shard-backed image stores for corpora that don't fit in RAM.

The reference caps its comparison set at 50k examples (run_lemon.py:48,
122-127) partly because everything is held in memory. The TPU rebuild
removes the cap with sharded kNN; this module removes the host-memory cap
on the *image* side: a directory of ``.npy`` shards is exposed as one
indexable (N, H, W, C) uint8 array backed by ``np.memmap`` — reads touch
only the pages a batch needs, so host RSS stays bounded by the page cache
regardless of corpus size (ROADMAP item 7 / round-1 verdict next-step 9).

Stores duck-type the ``images`` array of a Split: ``len()``, ``.shape``,
and fancy-index ``__getitem__`` returning a materialized uint8 batch.
``Split.subset`` keeps laziness through :class:`IndexedStore` row
indirection instead of copying pixels.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Sequence

import numpy as np


class ShardedUint8Store:
    """A directory of row-aligned .npy shards viewed as one big array."""

    def __init__(self, shard_paths: Sequence[Path]):
        assert shard_paths, "empty store"
        self._paths = [Path(p) for p in shard_paths]
        self._maps: List[np.memmap | None] = [None] * len(self._paths)
        rows = []
        row_shape = None
        for p in self._paths:
            # Read only the header (no data pages touched).
            mm = np.load(p, mmap_mode="r")
            assert mm.dtype == np.uint8, (p, mm.dtype)
            if row_shape is None:
                row_shape = mm.shape[1:]
            assert mm.shape[1:] == row_shape, (p, mm.shape, row_shape)
            rows.append(mm.shape[0])
        self._row_shape = row_shape
        self._offsets = np.concatenate([[0], np.cumsum(rows)])

    @classmethod
    def open(cls, directory) -> "ShardedUint8Store":
        directory = Path(directory)
        manifest = directory / "manifest.json"
        if manifest.exists():
            names = json.loads(manifest.read_text())["shards"]
            return cls([directory / n for n in names])
        return cls(sorted(directory.glob("shard_*.npy")))

    def __len__(self) -> int:
        return int(self._offsets[-1])

    @property
    def shape(self):
        return (len(self),) + tuple(self._row_shape)

    @property
    def dtype(self):
        return np.dtype(np.uint8)

    def _map(self, s: int) -> np.memmap:
        if self._maps[s] is None:
            self._maps[s] = np.load(self._paths[s], mmap_mode="r")
        return self._maps[s]

    def _native(self):
        """Lazily-built native pread gather engine (data/native_loader.py);
        False when the toolchain can't build it."""
        if not hasattr(self, "_native_engine"):
            try:
                from lemon_tpu.data.native_loader import NativeShardGather

                self._native_engine = NativeShardGather(self)
            except Exception:
                self._native_engine = False
        return self._native_engine

    def __getitem__(self, idx) -> np.ndarray:
        if isinstance(idx, (int, np.integer)):
            return self[np.asarray([idx])][0]
        if isinstance(idx, slice):
            idx = np.arange(*idx.indices(len(self)))
        idx = np.asarray(idx, np.int64)
        # ndarray duck-typing: resolve negative indices (store[-1] etc.)
        # before the shard lookup — searchsorted would map them to a bogus
        # shard/offset, and the native engine rejects them.
        if idx.size and (idx.min() < -len(self) or idx.max() >= len(self)):
            raise IndexError(
                f"index out of range for store of length {len(self)}"
            )
        idx = np.where(idx < 0, idx + len(self), idx)
        # Batch reads take the native threaded-pread engine; the numpy
        # memmap path below stays as the fallback and the test oracle.
        if len(idx) >= 32:
            eng = self._native()
            if eng:
                return eng.gather(idx)
        out = np.empty((len(idx),) + tuple(self._row_shape), np.uint8)
        shard_of = np.searchsorted(self._offsets, idx, side="right") - 1
        # Group reads per shard (shard-sequential I/O), preserve caller order.
        for s in np.unique(shard_of):
            sel = np.nonzero(shard_of == s)[0]
            local = idx[sel] - self._offsets[s]
            order = np.argsort(local)  # monotonic reads within the shard
            out[sel[order]] = self._map(int(s))[local[order]]
        return out


class IndexedStore:
    """Lazy row-indirection view over a store (Split.subset without copy)."""

    def __init__(self, store, idx: np.ndarray):
        self._store = store
        self._idx = np.asarray(idx, np.int64)
        self._row_shape = tuple(store.shape[1:])

    def __len__(self) -> int:
        return len(self._idx)

    @property
    def shape(self):
        return (len(self._idx),) + self._row_shape

    @property
    def dtype(self):
        return np.dtype(np.uint8)

    def __getitem__(self, idx) -> np.ndarray:
        if isinstance(idx, (int, np.integer)):
            return self._store[self._idx[int(idx)]]
        if isinstance(idx, slice):
            idx = np.arange(*idx.indices(len(self)))
        return self._store[self._idx[np.asarray(idx, np.int64)]]

    def fingerprint(self):
        """Content fingerprint without touching pixels: the base store's
        fingerprint plus this view's row selection. None when the base
        store has no cheap identity (memmap shards fall back to the
        pixel-sample key in ClipEncoder.cache_key)."""
        base = getattr(self._store, "fingerprint", None)
        if base is None:
            return None
        token = base()
        if token is None:
            return None
        import hashlib

        return f"{token}|rows:{hashlib.md5(self._idx.tobytes()).hexdigest()}"


class LazyRenderUint8Store:
    """Deferred procedural image source: rows exist as (render_fn, params)
    until pixels are actually read.

    Synthetic corpora (data/datasets.py synthetic_captioning) are pure
    functions of their seed/shape parameters, yet the eager ram backing
    paid the full render (~10.5 s at 20k×256²) on EVERY run_detection call
    — including warm runs that go on to read zero pixels because the
    embedding cache hits. This store defers rendering to first pixel
    access (one full materialization, then plain ndarray reads) and
    exposes the generator parameters as a ``fingerprint()`` so the
    embedding-cache key (ClipEncoder.cache_key) never forces pixels.
    """

    def __init__(self, render, n: int, row_shape, token: str):
        self._render = render
        self._n = int(n)
        self._row_shape = tuple(row_shape)
        self._token = token
        self._data: np.ndarray | None = None

    def __len__(self) -> int:
        return self._n

    @property
    def shape(self):
        return (self._n,) + self._row_shape

    @property
    def dtype(self):
        return np.dtype(np.uint8)

    def fingerprint(self) -> str:
        return self._token

    def materialize(self) -> np.ndarray:
        if self._data is None:
            data = np.ascontiguousarray(self._render())
            assert data.shape == self.shape and data.dtype == np.uint8, (
                data.shape,
                data.dtype,
                self.shape,
            )
            self._data = data
            self._render = None  # free closed-over templates
        return self._data

    def __getitem__(self, idx) -> np.ndarray:
        return self.materialize()[idx]


def is_lazy_store(images) -> bool:
    return isinstance(images, (ShardedUint8Store, IndexedStore, LazyRenderUint8Store))


def subset_images(images, idx: np.ndarray):
    """Row-subset an image source: ndarray -> copy, store -> lazy view."""
    if images is None:
        return None
    if is_lazy_store(images):
        return IndexedStore(images, idx)
    return images[idx]


class ShardWriter:
    """Append uint8 batches into shard_*.npy files of at most
    ``shard_rows`` rows each; ``finish()`` writes the manifest and returns
    the opened store."""

    def __init__(self, directory, shard_rows: int = 8192):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.shard_rows = shard_rows
        self._buf: List[np.ndarray] = []
        self._buffered = 0
        self._names: List[str] = []

    def append(self, batch: np.ndarray) -> None:
        batch = np.ascontiguousarray(batch, np.uint8)
        self._buf.append(batch)
        self._buffered += len(batch)
        while self._buffered >= self.shard_rows:
            self._flush(self.shard_rows)

    def _flush(self, rows: int) -> None:
        take, rest, got = [], [], 0
        for b in self._buf:
            if got >= rows:
                rest.append(b)
            elif got + len(b) <= rows:
                take.append(b)
                got += len(b)
            else:
                take.append(b[: rows - got])
                rest.append(b[rows - got :])
                got = rows
        name = f"shard_{len(self._names):05d}.npy"
        np.save(self.dir / name, np.concatenate(take))
        self._names.append(name)
        self._buf = rest
        self._buffered -= got

    def finish(self) -> ShardedUint8Store:
        if self._buffered:
            self._flush(self._buffered)
        (self.dir / "manifest.json").write_text(json.dumps({"shards": self._names}))
        return ShardedUint8Store.open(self.dir)
