"""Numpy stand-in for the faiss exact indexes (shim for driving the live
reference code in this faiss-less environment).

Implements only what the reference entry points touch: ``IndexFlatIP`` /
``IndexFlatL2`` with ``add``/``search``/``ntotal`` (run_lemon.py:166-177,
235-236; discrepancy_baseline.py:150-166). Ties break by ascending
database index (stable argsort) — the same deterministic rule as
lemon_tpu.knn.index.numpy_search, so both pipelines agree on tie order.
"""

import numpy as np


class _FlatIndex:
    def __init__(self, d):
        self.d = int(d)
        self._chunks = []
        self._xb = None

    @property
    def ntotal(self):
        return 0 if self._mat() is None else self._mat().shape[0]

    def _mat(self):
        if self._chunks:
            base = [self._xb] if self._xb is not None else []
            self._xb = np.concatenate(base + self._chunks, axis=0)
            self._chunks = []
        return self._xb

    def add(self, x):
        x = np.ascontiguousarray(x, dtype=np.float32)
        assert x.ndim == 2 and x.shape[1] == self.d, x.shape
        self._chunks.append(x)

    def reset(self):
        self._chunks, self._xb = [], None

    def search(self, q, k):
        q = np.ascontiguousarray(q, dtype=np.float32)
        xb = self._mat()
        n = 0 if xb is None else xb.shape[0]
        kk = min(k, n)
        scores = self._scores(q, xb) if n else np.zeros((len(q), 0), np.float32)
        order = np.argsort(self._sort_key(scores), axis=1, kind="stable")[:, :kk]
        d = np.take_along_axis(scores, order, axis=1).astype(np.float32)
        i = order.astype(np.int64)
        if kk < k:  # faiss pads missing neighbors with -1 ids
            pad_d = np.full((len(q), k - kk), self._pad_score(), np.float32)
            pad_i = np.full((len(q), k - kk), -1, np.int64)
            d = np.concatenate([d, pad_d], axis=1)
            i = np.concatenate([i, pad_i], axis=1)
        return d, i


class IndexFlatIP(_FlatIndex):
    def _scores(self, q, xb):
        return q @ xb.T

    def _sort_key(self, scores):
        return -scores  # descending similarity

    def _pad_score(self):
        return -np.inf


class IndexFlatL2(_FlatIndex):
    def _scores(self, q, xb):
        # squared euclidean, like faiss
        return (q * q).sum(1, keepdims=True) - 2.0 * (q @ xb.T) + (xb * xb).sum(1)[None, :]

    def _sort_key(self, scores):
        return scores  # ascending distance

    def _pad_score(self):
        return np.inf


class Kmeans:  # pragma: no cover - clustering is not exercised by the parity runs
    def __init__(self, *a, **k):
        raise NotImplementedError("faiss.Kmeans shim: not needed by the parity harness")


def omp_set_num_threads(n):  # referenced by some faiss users; harmless no-op
    pass
