"""Evaluation metric suite.

Reference parity: ``binary_metrics`` (lib/metrics/utils.py:348-405),
``prob_metrics`` (:408-412), ``eval_metrics`` (:414-441), ``get_stats``
(:256-271, ECE re-implemented since netcal is a reference-only dep).
sklearn remains the metric oracle (it is host-side, tiny, and exact);
device-side AUROC (:func:`auroc_device`) exists for fused in-graph
evaluation at scale, parity-tested against sklearn.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    balanced_accuracy_score,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

from lemon_tpu.scoring.thresholds import (
    f1_with_local_minima_finder,
    f1_with_pred_prev_constraint,
    optimize_f1,
    optimize_f1_efficient,
)


def binary_metrics(targets, preds, label_set=(0, 1), suffix: str = "", return_arrays: bool = False) -> Dict:
    targets = np.asarray(targets)
    preds = np.asarray(preds)
    if len(targets) == 0:
        return {}

    res = {
        "accuracy": accuracy_score(targets, preds),
        "F1": f1_score(targets, preds),
        "n_samples": len(targets),
    }
    if len(label_set) == 2:
        cm = confusion_matrix(targets, preds, labels=list(label_set))
        tn, fp, fn, tp = int(cm[0, 0]), int(cm[0, 1]), int(cm[1, 0]), int(cm[1, 1])
        res.update(TN=tn, FN=fn, TP=tp, FP=fp, error=fn + fp)
        res["TPR"] = tp / (tp + fn) if tp + fn else 0
        res["FNR"] = fn / (tp + fn) if tp + fn else 1
        res["FPR"] = fp / (fp + tn) if fp + tn else 1
        res["TNR"] = tn / (fp + tn) if fp + tn else 0
        res["PPV"] = tp / (tp + fp) if tp + fp else 0
        res["NPV"] = tn / (tn + fn) if tn + fn else 0
        res["pred_prevalence"] = (tp + fp) / res["n_samples"]
        res["prevalence"] = (tp + fn) / res["n_samples"]
    else:
        res["TPR"] = recall_score(targets, preds, labels=list(label_set), average="macro", zero_division=0.0)

    if len(np.unique(targets)) > 1:
        res["balanced_acc"] = balanced_accuracy_score(targets, preds)
    if return_arrays:
        res["targets"] = targets
        res["preds"] = preds
    return {f"{name}{suffix}": val for name, val in res.items()}


def prob_metrics(targets, preds, sample_weight=None) -> Dict:
    return {
        "AUROC": roc_auc_score(targets, preds, sample_weight=sample_weight),
        "AUPRC": average_precision_score(targets, preds, average="macro", sample_weight=sample_weight),
    }


def eval_metrics(y, score, prevalence, fix_thress: Dict | None = None, use_efficient: bool = False) -> Dict:
    """Threshold-dependent + threshold-free metric bundle
    (lib/metrics/utils.py:414-441). ``fix_thress`` carries thresholds
    selected on the validation split for reuse on train/test."""
    fix_thress = fix_thress or {}
    y = np.asarray(y)
    score = np.asarray(score)

    if "F1_optimal_thres" in fix_thress:
        t_opt = fix_thress["F1_optimal_thres"]
    else:
        _, t_opt = (optimize_f1_efficient if use_efficient else optimize_f1)(y, score, True)

    if "F1_prev_thres" in fix_thress:
        t_prev = fix_thress["F1_prev_thres"]
    else:
        _, t_prev = f1_with_pred_prev_constraint(y, score, prevalence, True)

    if "F1_heuristic_thres" in fix_thress:
        t_heur = fix_thress["F1_heuristic_thres"]
    else:
        _, t_heur = f1_with_local_minima_finder(y, score, True)

    return {
        **prob_metrics(y, score),
        "F1_optimal_thres": t_opt,
        "F1_prev_thres": t_prev,
        "F1_heuristic_thres": t_heur,
        **binary_metrics(y, score >= t_opt, suffix="_optimal"),
        **binary_metrics(y, score >= t_prev, suffix="_prev"),
        **binary_metrics(y, score >= t_heur, suffix="_heuristic"),
    }


def expected_calibration_error(confidences, correct, n_bins: int = 10) -> float:
    """Binned ECE (replaces netcal.metrics.ECE, lib/metrics/utils.py:270):
    equal-width confidence bins, |acc - conf| weighted by bin mass."""
    confidences = np.asarray(confidences, dtype=np.float64)
    correct = np.asarray(correct, dtype=np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    which = np.clip(np.digitize(confidences, edges[1:-1]), 0, n_bins - 1)
    ece = 0.0
    n = len(confidences)
    for b in range(n_bins):
        mask = which == b
        if mask.any():
            ece += mask.mean() * abs(correct[mask].mean() - confidences[mask].mean())
    return float(ece)


def get_stats(true, pred) -> Dict:
    """Per-group stat bundle for downstream worst-group accuracy
    (lib/metrics/utils.py:256-271)."""
    true = np.asarray(true)
    pred = np.asarray(pred)
    res = {}
    try:
        res["auroc"] = roc_auc_score(true, pred)
    except ValueError:
        res["auroc"] = None
    res["accuracy"] = accuracy_score(true, pred)
    if np.unique(true).size == 2:
        res["true_label_rate"] = float(np.mean(true))
        average = "binary"
    else:
        average = "micro"
    res["precision"] = precision_score(true, pred, labels=np.unique(true), average=average)
    res["f1_score"] = f1_score(true, pred, labels=np.unique(true), average=average)
    res["ece"] = expected_calibration_error(pred, true == (pred >= 0.5) if pred.dtype.kind == "f" else true == pred)
    return res


# ---------------------------------------------------------------------------
# device-side rank metrics (for in-graph evaluation at scale)


@jax.jit
def auroc_device(y: jnp.ndarray, score: jnp.ndarray) -> jnp.ndarray:
    """AUROC via the rank formulation with midrank tie handling; matches
    sklearn.roc_auc_score to ~1e-9 (test_scoring.py)."""
    n = score.shape[0]
    order = jnp.argsort(score)
    sorted_scores = score[order]
    ranks_sorted = jnp.arange(1, n + 1, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    # midranks for ties: average rank over each tied run
    is_new = jnp.concatenate([jnp.array([True]), sorted_scores[1:] != sorted_scores[:-1]])
    group = jnp.cumsum(is_new) - 1
    group_sum = jax.ops.segment_sum(ranks_sorted, group, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(ranks_sorted), group, num_segments=n)
    midrank_sorted = (group_sum / jnp.maximum(group_cnt, 1))[group]
    ranks = jnp.zeros_like(midrank_sorted).at[order].set(midrank_sorted)
    y = y.astype(ranks.dtype)
    n_pos = jnp.sum(y)
    n_neg = n - n_pos
    auc = (jnp.sum(ranks * y) - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1)
    return auc
