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
    # range check only: a split may validly contain no class-0 examples
    assert y.min() >= 0 and y.max() < probs_epochs.shape[2], "labels out of range"
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
    assert y.min() >= 0 and y.max() < probs_epochs.shape[2], "labels out of range"
    n = len(y)
    true_p = probs_epochs[:, np.arange(n), y]  # (E, N)
    mean = true_p.mean(axis=0)
    std = true_p.std(axis=0)
    if threshold is None:
        flags = (mean < 0.5) & (std < 0.1)
    else:
        flags = (mean <= threshold) & (std <= threshold)
    return flags.astype(np.int64), np.stack([mean, std], axis=1)


def knn_label_distribution(
    features: np.ndarray,
    labels: np.ndarray,
    n_classes: int,
    k: int = 10,
    min_similarity: float = 0.0,
    norm: str = "l2",
) -> np.ndarray:
    """Per-example class-probability estimate from weighted kNN votes
    (count_knn_distribution, lib/metrics/utils.py:205-233).

    Runs through the tiled :class:`~lemon_tpu.knn.ExactKnnIndex` (the
    FAISS-role component) instead of materializing the full N x N
    cosine-distance matrix — at the pipeline's own comparison-set scale
    (50k-500k rows) the dense matrix would OOM the device. Ordering is
    identical: descending similarity with ascending-index tie-break
    matches lax.top_k's first-occurrence rule on the dense path."""
    from lemon_tpu.knn import ExactKnnIndex

    labels = np.asarray(labels)
    f = np.asarray(features, np.float32)
    if not 3 <= k <= len(f):
        raise ValueError(f"k={k} must be in [3, n_rows={len(f)}] (self-distance extrapolation needs 3 neighbors)")
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-30)
    index = ExactKnnIndex(metric="ip")
    index.add(f)
    sims, idx = index.search(f, k)
    vals = 1.0 - sims  # ascending cosine distances; first hit is self
    # SimiFeat trick: replace the self distance (~0) with a linear
    # extrapolation from neighbors 1 and 2 (lib/metrics/utils.py:214).
    vals[:, 0] = 2.0 * vals[:, 1] - vals[:, 2]
    weights = (1.0 - min_similarity - vals).astype(np.float32)  # (N, k)
    n = len(f)
    # bincount scatter over flat (row, class) indices: one vectorized pass,
    # unlike np.add.at's unbuffered per-element loop (O(N*k) scalar adds).
    flat = np.arange(n).repeat(k) * n_classes + labels[idx].ravel()
    votes = np.bincount(flat, weights=weights.ravel().astype(np.float64),
                        minlength=n * n_classes).reshape(n, n_classes).astype(np.float32)
    if norm == "l2":
        denom = np.linalg.norm(votes, axis=1, keepdims=True)
    elif norm == "l1":
        denom = votes.sum(axis=1, keepdims=True)
    else:
        raise NameError(norm)
    return votes / np.maximum(denom, 1e-30)
