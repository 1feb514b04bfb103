"""The LEMoN mislabel score.

    s(x, y) = d_1(x, y) + beta * d_n(x, y) + gamma * d_m(x, y)

where, per example, with k neighbors from the comparison set:

    d_n = (1/k) * sum_j exp(-tau_1n * D_n[j]) * exp(-tau_2n * dtr_n[j]) * dists_n[j]
    d_m = symmetric with the text-neighbor quantities

(reference math: lib/metrics/utils.py:47-82; component extraction:
run_lemon.py:238-307). ``D_n`` are (signed) image-space neighbor distances,
``dists_n`` text distances to the neighbors' captions, ``dtr_n`` the
neighbors' own image<->text pair distances.

Data layout is struct-of-dense-arrays (``NeighborLogs``), not a pandas frame
of object columns — (N, k) matrices feed a single fused device computation,
and the full hyperparameter *grid* evaluates as one batched (G, N) program
(:func:`calc_scores_grid`), replacing the reference's 8,000-iteration
host loop (run_lemon.py:332-337 + maximize_metric grid pass).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

HPARAM_ORDER = ("beta", "gamma", "tau_1_n", "tau_2_n", "tau_1_m", "tau_2_m")


def unpack_hparams(x: Sequence[float], force_zero=(), force_one=()) -> Dict[str, float]:
    """6-vector -> named hparams with ablation masks
    (lib/metrics/utils.py:84-102)."""
    out = dict(zip(HPARAM_ORDER, [float(v) for v in x]))
    for name in out:
        if name in force_zero:
            out[name] = 0.0
    for name in out:
        if name in force_one:
            out[name] = 1.0
    return out


def pack_hparams(h: Dict[str, float]) -> np.ndarray:
    return np.array([h[k] for k in HPARAM_ORDER], dtype=np.float64)


@dataclasses.dataclass
class NeighborLogs:
    """Dense per-example neighbor statistics for one or more splits.

    Shapes: d_1 (N,); every neighbor matrix (N, k). ``sset`` is a string
    array tagging each row's split; ``is_mislabel`` the binary target.
    """

    d_1: np.ndarray
    dists_n: np.ndarray
    D_n: np.ndarray
    dists_tr_n: np.ndarray
    dists_m: np.ndarray
    D_m: np.ndarray
    dists_tr_m: np.ndarray
    is_mislabel: np.ndarray
    sset: np.ndarray
    idx: Optional[np.ndarray] = None
    noisy_label: Optional[np.ndarray] = None
    actual_label: Optional[np.ndarray] = None
    noisy_label_text: Optional[np.ndarray] = None
    actual_label_text: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.d_1)

    @property
    def k(self) -> int:
        return self.dists_n.shape[1]

    def select(self, mask: np.ndarray) -> "NeighborLogs":
        pick = lambda a: None if a is None else a[mask]
        return NeighborLogs(
            d_1=self.d_1[mask],
            dists_n=self.dists_n[mask],
            D_n=self.D_n[mask],
            dists_tr_n=self.dists_tr_n[mask],
            dists_m=self.dists_m[mask],
            D_m=self.D_m[mask],
            dists_tr_m=self.dists_tr_m[mask],
            is_mislabel=self.is_mislabel[mask],
            sset=self.sset[mask],
            idx=pick(self.idx),
            noisy_label=pick(self.noisy_label),
            actual_label=pick(self.actual_label),
            noisy_label_text=pick(self.noisy_label_text),
            actual_label_text=pick(self.actual_label_text),
        )

    def split(self, name: str) -> "NeighborLogs":
        return self.select(self.sset == name)

    def to_dataframe(self):
        """Reference-compatible pandas frame (res.pkl 'df' layout,
        run_lemon.py:291-307): neighbor rows become object columns."""
        import pandas as pd

        n = len(self)
        data = {
            "sset": self.sset,
            "idx": self.idx if self.idx is not None else np.arange(n),
            "is_mislabel": self.is_mislabel.astype(np.int64),
            "is_correct_label": 1 - self.is_mislabel.astype(np.int64),
            "d_1": self.d_1,
            "dists_n": list(self.dists_n),
            "D_n": list(self.D_n),
            "dists_tr_n": list(self.dists_tr_n),
            "dists_m": list(self.dists_m),
            "D_m": list(self.D_m),
            "dists_tr_m": list(self.dists_tr_m),
        }
        if self.noisy_label is not None:
            data["noisy_label"] = self.noisy_label
        if self.actual_label is not None:
            data["actual_label"] = self.actual_label
        if self.noisy_label_text is not None:
            data["noisy_label_text"] = self.noisy_label_text
        if self.actual_label_text is not None:
            data["actual_label_text"] = self.actual_label_text
        return pd.DataFrame(data)

    @staticmethod
    def from_dataframe(df) -> "NeighborLogs":
        get = lambda c: df[c].to_numpy() if c in df else None
        return NeighborLogs(
            d_1=df["d_1"].to_numpy(dtype=np.float64),
            dists_n=np.stack(df["dists_n"].to_list()),
            D_n=np.stack(df["D_n"].to_list()),
            dists_tr_n=np.stack(df["dists_tr_n"].to_list()),
            dists_m=np.stack(df["dists_m"].to_list()),
            D_m=np.stack(df["D_m"].to_list()),
            dists_tr_m=np.stack(df["dists_tr_m"].to_list()),
            is_mislabel=df["is_mislabel"].to_numpy(),
            sset=df["sset"].to_numpy(),
            idx=get("idx"),
            noisy_label=get("noisy_label"),
            actual_label=get("actual_label"),
        )


def _dn_dm(logs: NeighborLogs, h: Dict[str, float], xp=np):
    wn = xp.exp(-h["tau_1_n"] * logs.D_n) * xp.exp(-h["tau_2_n"] * logs.dists_tr_n)
    wm = xp.exp(-h["tau_1_m"] * logs.D_m) * xp.exp(-h["tau_2_m"] * logs.dists_tr_m)
    d_n = xp.sum(wn * logs.dists_n, axis=1) / logs.k
    d_m = xp.sum(wm * logs.dists_m, axis=1) / logs.k
    return d_n, d_m


def calc_scores(logs: NeighborLogs, hparams: Dict[str, float], return_components: bool = False):
    """Vectorized numpy score (parity with
    calc_scores_given_hparams_vectorized, lib/metrics/utils.py:47-82)."""
    d_n, d_m = _dn_dm(logs, hparams, xp=np)
    scores = logs.d_1 + hparams["beta"] * d_n + hparams["gamma"] * d_m
    if return_components:
        return scores, d_n, d_m
    return scores


@jax.jit
def _scores_grid_device(d1, dists_n, D_n, dtr_n, dists_m, D_m, dtr_m, grid):
    """All grid points at once: grid (G, 6) -> scores (G, N)."""
    beta, gamma, t1n, t2n, t1m, t2m = [grid[:, i][:, None, None] for i in range(6)]
    wn = jnp.exp(-t1n * D_n[None] - t2n * dtr_n[None])
    wm = jnp.exp(-t1m * D_m[None] - t2m * dtr_m[None])
    k = dists_n.shape[1]
    d_n = jnp.sum(wn * dists_n[None], axis=2) / k
    d_m = jnp.sum(wm * dists_m[None], axis=2) / k
    return d1[None] + beta[:, :, 0] * d_n + gamma[:, :, 0] * d_m


def calc_scores_grid(logs: NeighborLogs, grid: np.ndarray, batch: int = 256) -> np.ndarray:
    """Evaluate (G, 6) hparam combinations -> (G, N) scores on device."""
    grid = np.asarray(grid, dtype=np.float32)
    args = [
        jnp.asarray(a, jnp.float32)
        for a in (
            logs.d_1,
            logs.dists_n,
            logs.D_n,
            logs.dists_tr_n,
            logs.dists_m,
            logs.D_m,
            logs.dists_tr_m,
        )
    ]
    out = []
    for start in range(0, len(grid), batch):
        g = jnp.asarray(grid[start : start + batch])
        out.append(np.asarray(_scores_grid_device(*args, g)))
    return np.concatenate(out, axis=0)


def soft_margin_proxy_loss(x: jnp.ndarray, logs_arrays, y_signed: jnp.ndarray, force_zero_mask, force_one_mask):
    """Differentiable proxy for F1: SoftMarginLoss(score, y in {-1, 1}) =
    mean(log(1 + exp(-y * score))) (lib/metrics/utils.py:123-127).

    ``x`` is the raw 6-vector; ablation masks are applied inside so the
    gradient respects them.
    """
    d1, dists_n, D_n, dtr_n, dists_m, D_m, dtr_m = logs_arrays
    # Keep the loss finite over the whole reachable iterate space. Raw
    # exp(-t*D) overflows float32 once an L-BFGS trajectory pushes a tau
    # past ~88 (cosine D_n ~ -1), and a single inf poisons the zoom
    # linesearch with NaNs — measured on XLA:CPU, the scanned optimizer
    # program then degenerates from ~0.3 s to tens of MINUTES (an
    # effectively unbounded run; this hung real sweep jobs). Clamp the
    # hparams to the grid's own domain (|h| <= 100, run_lemon.py:332-337)
    # and the exponent to +-60: every downstream product stays far inside
    # float32 range for ANY iterate, gradients are exactly zero outside
    # the clamp, and the linesearch terminates. Inside the domain the
    # loss is unchanged. (The host torch proxy in strict-parity mode
    # stays unguarded like the reference's, lib/metrics/utils.py:123-141.)
    x = jnp.clip(x, -100.0, 100.0)
    x = jnp.where(force_zero_mask, 0.0, x)
    x = jnp.where(force_one_mask, 1.0, x)
    beta, gamma, t1n, t2n, t1m, t2m = x
    k = dists_n.shape[1]
    wn = jnp.exp(jnp.clip(-t1n * D_n - t2n * dtr_n, -60.0, 60.0))
    wm = jnp.exp(jnp.clip(-t1m * D_m - t2m * dtr_m, -60.0, 60.0))
    d_n = jnp.sum(wn * dists_n, axis=1) / k
    d_m = jnp.sum(wm * dists_m, axis=1) / k
    score = d1 + beta * d_n + gamma * d_m
    return jnp.mean(jnp.logaddexp(0.0, -y_signed * score))
