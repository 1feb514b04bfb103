"""Distance-based and training-dynamics detection scores.

Vectorized equivalents of DistanceEvaluator
(lib/metrics/distance_metrics.py:33-181):

- :func:`pair_distances` — per-pair modality distance (the reference builds
  full pairwise matrices and takes the diagonal, :56-73; we compute the
  diagonal directly: O(N*D) instead of O(N^2*D)).
- :func:`aum_score` — area-under-margin over training epochs (:139-172).
- :func:`datamap_score` — mean/std of the assigned-label probability over
  epochs (Datamaps; :93-137).
- :func:`knn_label_distribution` — SimiFeat-style weighted kNN label votes
  (lib/metrics/utils.py:198-233), the core of the deep-kNN baseline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pair_distances(a: np.ndarray, b: np.ndarray, dist: str = "cosine") -> np.ndarray:
    """Row-wise distance between two aligned embedding matrices (N, D)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if dist == "cosine":
        num = np.sum(a * b, axis=1)
        denom = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return 1.0 - num / np.maximum(denom, 1e-30)
    if dist == "euclidean":
        return np.sqrt(np.sum((a - b) ** 2, axis=1))
    if dist == "manhattan":
        return np.sum(np.abs(a - b), axis=1)
    raise NotImplementedError(dist)


def aum_score(probs_epochs: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Mean over epochs of (P[assigned label] - max P[other observed label]).

    probs_epochs: (E, N, C); y: (N,) assigned (noisy) labels. Low margin ->
    likely mislabeled. 'Other' ranges over labels observed in y, matching
    the reference (:157-162).
    """
    probs_epochs = np.asarray(probs_epochs)
    y = np.asarray(y)
    assert y.min() == 0, "labels must be 0-indexed"
    observed = np.unique(y)
    e, n, c = probs_epochs.shape
    true_p = probs_epochs[:, np.arange(n), y]  # (E, N)
    masked = np.full((e, n, c), -np.inf)
    masked[:, :, observed] = probs_epochs[:, :, observed]
    masked[:, np.arange(n), y] = -np.inf
    other_max = masked.max(axis=2)  # (E, N)
    return (true_p - other_max).mean(axis=0)


def datamap_score(probs_epochs: np.ndarray, y: np.ndarray, threshold: float | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Datamaps: (flag, (mean confidence, variability)) per example.

    flag = (mean < 0.5) & (std < 0.1) by default, or both <= threshold when
    given (:120-133).
    """
    probs_epochs = np.asarray(probs_epochs)
    y = np.asarray(y)
    assert y.min() == 0, "labels must be 0-indexed"
    n = len(y)
    true_p = probs_epochs[:, np.arange(n), y]  # (E, N)
    mean = true_p.mean(axis=0)
    std = true_p.std(axis=0)
    if threshold is None:
        flags = (mean < 0.5) & (std < 0.1)
    else:
        flags = (mean <= threshold) & (std <= threshold)
    return flags.astype(np.int64), np.stack([mean, std], axis=1)


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_votes(features: jnp.ndarray, labels_onehot: jnp.ndarray, k: int, min_similarity: float):
    """Weighted kNN label votes on device (cosine distance)."""
    f = features / jnp.linalg.norm(features, axis=1, keepdims=True)
    dist = 1.0 - f @ f.T
    neg_vals, idx = jax.lax.top_k(-dist, k)  # ascending distances
    vals = -neg_vals
    # First hit is self (distance ~0): the SimiFeat trick replaces it with a
    # linear extrapolation from neighbors 1 and 2 (lib/metrics/utils.py:214).
    vals = vals.at[:, 0].set(2.0 * vals[:, 1] - vals[:, 2])
    weights = 1.0 - min_similarity - vals  # (N, k)
    votes = jnp.einsum("nk,nkc->nc", weights, labels_onehot[idx])
    return votes


def knn_label_distribution(
    features: np.ndarray,
    labels: np.ndarray,
    n_classes: int,
    k: int = 10,
    min_similarity: float = 0.0,
    norm: str = "l2",
) -> np.ndarray:
    """Per-example class-probability estimate from weighted kNN votes
    (count_knn_distribution, lib/metrics/utils.py:205-233)."""
    onehot = np.eye(n_classes, dtype=np.float32)[np.asarray(labels)]
    votes = np.asarray(_knn_votes(jnp.asarray(features, jnp.float32), jnp.asarray(onehot), k, min_similarity))
    if norm == "l2":
        denom = np.linalg.norm(votes, axis=1, keepdims=True)
    elif norm == "l1":
        denom = votes.sum(axis=1, keepdims=True)
    else:
        raise NameError(norm)
    return votes / np.maximum(denom, 1e-30)
