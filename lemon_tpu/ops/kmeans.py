"""Jitted k-means (Lloyd's algorithm).

Replaces faiss.Kmeans (lib/datasets/clustering.py:13-41; n_init restarts,
max_iter Lloyd's steps, max_points_per_centroid subsampling) with a pure
XLA program: the assignment step is a distance matmul on the MXU, the
update step a segment-sum — both batched over restarts via vmap. Runs
unchanged on CPU meshes for tests. All n_init restarts run in one
vmapped dispatch (_lloyd_restarts).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _lloyd_impl(x: jnp.ndarray, init_centroids: jnp.ndarray, n_clusters: int, n_iter: int):
    """x: (N, D); init_centroids: (K, D). Returns (centroids, inertia)."""
    x_sq = jnp.sum(x * x, axis=1)

    def assign(centroids):
        # squared distance via ||x||^2 - 2 x.c + ||c||^2 (MXU matmul)
        logits = x @ centroids.T
        c_sq = jnp.sum(centroids * centroids, axis=1)
        d = x_sq[:, None] - 2.0 * logits + c_sq[None, :]
        labels = jnp.argmin(d, axis=1)
        return labels, jnp.min(d, axis=1)

    def step(centroids, _):
        labels, _ = assign(centroids)
        one_hot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ x
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, init_centroids, None, length=n_iter)
    _, dists = assign(centroids)
    return centroids, jnp.sum(dists)


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter"))
def _lloyd_restarts(x: jnp.ndarray, inits: jnp.ndarray, n_clusters: int, n_iter: int):
    """All n_init restarts in ONE dispatch: vmap over the (R, K, D) init
    axis — on the remote-TPU relay a serial restart loop pays per-RPC
    latency R times for no reason."""
    return jax.vmap(lambda c0: _lloyd_impl(x, c0, n_clusters, n_iter))(inits)


@functools.partial(jax.jit, static_argnames=())
def _assign_labels(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    d = (
        jnp.sum(x * x, axis=1)[:, None]
        - 2.0 * x @ centroids.T
        + jnp.sum(centroids * centroids, axis=1)[None, :]
    )
    return jnp.argmin(d, axis=1)


@dataclasses.dataclass
class KMeans:
    """faiss.Kmeans-compatible surface: fit(x) then predict(x)."""

    n_clusters: int
    n_init: int = 5
    max_iter: int = 300
    max_points_per_centroid: int = 1024
    seed: int = 0
    centroids: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "KMeans":
        x = np.ascontiguousarray(x, np.float32)
        rng = np.random.default_rng(self.seed)
        cap = self.n_clusters * self.max_points_per_centroid
        if len(x) > cap:
            x = x[rng.choice(len(x), cap, replace=False)]
        x_dev = jnp.asarray(x)

        inits = np.stack([
            x[rng.choice(len(x), self.n_clusters, replace=False)]
            for _ in range(self.n_init)
        ])
        centroids, inertias = _lloyd_restarts(
            x_dev, jnp.asarray(inits), self.n_clusters, self.max_iter
        )
        best = int(np.argmin(np.asarray(inertias)))
        self.centroids = np.asarray(centroids[best])
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        assert self.centroids is not None, "fit first"
        return np.asarray(_assign_labels(jnp.asarray(np.asarray(x, np.float32)), jnp.asarray(self.centroids)))
