"""Native batch assembly + prefetch for sharded image stores.

The reference's input pipeline rides torch DataLoader's native worker pool
(lib/datasets/dataloader.py consumers); this is the streaming-store
equivalent: ``shard_gather.cc`` preads batch rows from the shard files on a
thread pool (no memmap page-fault serialization, no GIL), and
:class:`Prefetcher` overlaps assembly of batch t+1 with device compute on
batch t from a background thread.

Falls back transparently: ``native_gather_available()`` is False when g++
is missing, and ``ShardedUint8Store.__getitem__`` (pure numpy memmap)
remains the oracle path — tests cross-check the two.
"""

from __future__ import annotations

import ctypes
import functools
import queue
import subprocess
import threading
from pathlib import Path
from typing import Callable, Iterable, Iterator, Optional

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "shard_gather.cc"
_LIB = Path(__file__).parent / "csrc" / "_shard_gather.so"


def _build() -> Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB), "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_build()))
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.shard_gather.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        i64p, i64p, i64p, ctypes.c_int64,
        i64p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    lib.shard_gather.restype = ctypes.c_int64
    return lib


def native_gather_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _npy_data_offset(path: Path) -> int:
    """Byte offset of the array data in a .npy file (v1/v2/v3 headers)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic[:6] == b"\x93NUMPY", path
        major = magic[6]
        if major == 1:
            (hlen,) = np.frombuffer(f.read(2), "<u2")
            return 10 + int(hlen)
        (hlen,) = np.frombuffer(f.read(4), "<u4")
        return 12 + int(hlen)


class NativeShardGather:
    """Row gather over a :class:`~lemon_tpu.data.streaming.ShardedUint8Store`
    via the native pread engine."""

    def __init__(self, store, n_threads: int = 8):
        # Duck interface: store exposes _paths, _offsets, _row_shape
        # (streaming.ShardedUint8Store).
        self._paths = [str(p).encode() for p in store._paths]
        self._c_paths = (ctypes.c_char_p * len(self._paths))(*self._paths)
        offsets = np.asarray(store._offsets, np.int64)
        self._first_row = np.ascontiguousarray(offsets[:-1])
        self._rows = np.ascontiguousarray(np.diff(offsets))
        self._data_off = np.asarray([_npy_data_offset(Path(p)) for p in store._paths], np.int64)
        self._row_shape = tuple(store._row_shape)
        self._row_bytes = int(np.prod(self._row_shape))
        self._n = int(offsets[-1])
        self.n_threads = n_threads

    def __len__(self) -> int:
        return self._n

    def gather(self, idx, out: Optional[np.ndarray] = None) -> np.ndarray:
        idx = np.ascontiguousarray(np.asarray(idx, np.int64).ravel())
        assert idx.size == 0 or (idx.min() >= 0 and idx.max() < self._n), "index out of range"
        if out is None:
            out = np.empty((len(idx),) + self._row_shape, np.uint8)
        else:
            # reshape below must be a VIEW: a non-contiguous caller buffer
            # would get a silent copy and the gathered bytes lost
            assert out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8, "out must be C-contiguous uint8"
            assert out.shape == (len(idx),) + self._row_shape, (out.shape, len(idx), self._row_shape)
        if len(idx) == 0:
            return out
        rc = _lib().shard_gather(
            self._c_paths, len(self._paths),
            self._first_row, self._rows, self._data_off,
            self._row_bytes, idx, len(idx), out.reshape(len(idx), -1),
            self.n_threads,
        )
        if rc != 0:
            raise IOError(f"shard_gather failed (code {rc})")
        return out


class Prefetcher:
    """Run ``fn(item)`` for each item of ``items`` on a background thread,
    keeping up to ``depth`` results ready.

    Typical use: ``Prefetcher(batch_index_iter, gather.gather)`` overlaps
    native batch assembly with device compute. Exceptions surface on the
    consuming side at the failing position; iteration stops the worker.
    """

    _DONE = object()

    def __init__(self, items: Iterable, fn: Callable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()

        def work():
            try:
                for it in items:
                    if self._stop.is_set():
                        return
                    self._q.put(fn(it))
            except BaseException as e:  # surfaced on the consumer side
                self._q.put(e)
                return
            self._q.put(self._DONE)

        self._t = threading.Thread(target=work, daemon=True)
        self._t.start()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self) -> None:
        self._stop.set()
        # drain one slot so a blocked worker can observe the stop flag
        try:
            self._q.get_nowait()
        except queue.Empty:
            pass
        self._t.join(timeout=5)
