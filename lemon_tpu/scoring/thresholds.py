"""Threshold selection for binarizing mislabel scores.

Four strategies matching the reference's semantics exactly (SURVEY.md §7
hard part #5 — the data-dependent fallback chains are ported precisely):

- :func:`optimize_f1` — 100-point linspace scan (lib/metrics/utils.py:273-284)
- :func:`optimize_f1_efficient` — scipy fminbound on -F1
  (lib/metrics/utils.py:286-296); the selection objective used by run_lemon
- :func:`f1_with_pred_prev_constraint` — threshold whose predicted
  prevalence matches a target, via bisection with a squared-error fminbound
  fallback (lib/metrics/utils.py:298-321)
- :func:`f1_with_local_minima_finder` — unsupervised: local minima of a
  gaussian-KDE score density, median of minima, falling back to maxima then
  the global mean (lib/metrics/utils.py:326-346)

Plus :func:`optimize_f1_exact` — a sort+cumsum exact scan over *all*
thresholds, an upgrade the reference lacks (its linspace/fminbound scans can
miss the true optimum of the step-function F1).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import bisect, fminbound
from scipy.signal import argrelextrema
from scipy.stats import gaussian_kde
from sklearn.metrics import f1_score


def _fast_f1(y: np.ndarray, pred: np.ndarray) -> float:
    """Binary F1, bit-identical to ``sklearn.metrics.f1_score`` (same
    precision/recall formula and operation order, zero_division -> 0.0)
    without sklearn's ~2 ms of per-call input validation. The threshold
    searches below call this thousands of times inside the hparam
    optimizer ensemble (measured: 91 -> ~2 ms per fminbound, which is the
    bulk of the pipeline's hparam_scipy phase)."""
    tp = np.count_nonzero(y & pred)
    pred_pos = np.count_nonzero(pred)
    pos = np.count_nonzero(y)
    # sklearn's f-score path evaluates 2*tp / (2*tp + fp + fn) in one
    # division; replicating that form (not 2pr/(p+r)) keeps the last ulp.
    denom = pred_pos + pos  # == 2tp + fp + fn
    return 2.0 * tp / denom if denom else 0.0


def _as_binary(y) -> np.ndarray:
    """Validate-and-cast labels once per call (sklearn's f1_score used to
    raise on non-binary input; keep that misuse loud rather than letting a
    bool cast silently corrupt threshold selection)."""
    arr = np.asarray(y)
    if arr.dtype != np.bool_:
        if not np.isin(arr, (0, 1)).all():
            raise ValueError(f"binary labels required, got values outside {{0, 1}} (dtype {arr.dtype})")
        arr = arr.astype(bool)
    return arr


def optimize_f1(y, score, return_thres: bool = False):
    y = _as_binary(y)
    score = np.asarray(score)
    best_thres, best_f1 = 0.0, 0.0
    for cand in np.linspace(score.min(), score.max(), 100):
        f1 = _fast_f1(y, score >= cand)
        if f1 >= best_f1:
            best_f1, best_thres = f1, cand
    return (best_f1, best_thres) if return_thres else best_f1


def optimize_f1_efficient(y, score, return_thres: bool = False):
    y = _as_binary(y)
    score = np.asarray(score)
    thres = fminbound(lambda t: -_fast_f1(y, score >= t), score.min(), score.max(), xtol=1e-8, disp=0)
    f1 = _fast_f1(y, score >= thres)
    return (f1, thres) if return_thres else f1


def optimize_f1_exact(y, score, return_thres: bool = False):
    """Exact maximum-F1 threshold via a single sort + cumulative counts.

    F1 as a function of threshold is a step function changing only at
    observed scores; this evaluates every step in O(N log N).
    """
    y = np.asarray(y).astype(np.int64)
    score = np.asarray(score, dtype=np.float64)
    order = np.argsort(-score, kind="stable")
    y_sorted = y[order]
    s_sorted = score[order]
    tp = np.cumsum(y_sorted)
    pred_pos = np.arange(1, len(y) + 1)
    pos = y.sum()
    f1 = 2 * tp / (pred_pos + pos)  # == 2TP / (2TP + FP + FN)
    # A threshold t = s_sorted[i] predicts positive for all tied values too;
    # only positions where the next score differs are realizable cuts.
    realizable = np.r_[s_sorted[:-1] > s_sorted[1:], True]
    f1 = np.where(realizable, f1, -1.0)
    best = int(np.argmax(f1))
    return (float(f1[best]), float(s_sorted[best])) if return_thres else float(f1[best])


def f1_with_pred_prev_constraint(y, score, pred_prev, return_thres: bool = False):
    y = np.asarray(y)
    score = np.asarray(score)

    def excess(t):
        return (score >= t).sum() / len(score) - pred_prev

    try:
        thres = bisect(excess, score.min(), score.max())
        f1 = f1_score(y, score >= thres)
    except ValueError:
        return _prev_constraint_fallback(y, score, pred_prev, return_thres)
    if np.isnan(thres) or np.isnan(f1):
        return _prev_constraint_fallback(y, score, pred_prev, return_thres)
    return (f1, thres) if return_thres else f1


def _prev_constraint_fallback(y, score, pred_prev, return_thres: bool):
    thres = fminbound(
        lambda t: ((score >= t).sum() / len(score) - pred_prev) ** 2, score.min(), score.max()
    )
    f1 = f1_score(y, score >= thres)
    return (f1, thres) if return_thres else f1


def f1_with_local_minima_finder(y, score, return_thres: bool = False):
    y = np.asarray(y)
    score = np.asarray(score)
    if np.all(score == score.flat[0]):
        # Degenerate constant scores: gaussian_kde needs a non-singular
        # covariance (the reference would crash here; any threshold at the
        # constant yields identical predictions, matching its final
        # global-mean fallback, lib/metrics/utils.py:339).
        thres = float(score.flat[0])
        f1 = f1_score(y, score >= thres)
        return (f1, thres) if return_thres else f1
    density = gaussian_kde(score)
    xs = np.linspace(score.min(), score.max(), 1000)
    ys = density.evaluate(xs)
    minima = xs[argrelextrema(ys, np.less)]
    if len(minima) > 1:
        thres = np.median(minima)
    elif len(minima) == 1:
        thres = minima[0]
    else:
        maxima = xs[argrelextrema(ys, np.greater)]
        thres = np.median(maxima) if len(maxima) >= 2 else np.mean(score)
    f1 = f1_score(y, score >= thres)
    return (f1, thres) if return_thres else f1
