"""Label-noise injection.

Two families, matching the reference's semantics *and RNG streams* so that a
given (dataset, noise_type, noise_level, data_seed) produces bit-identical
noisy labels:

1. **Classification noise** via row-stochastic transition matrices
   (SimiFeat-derived; lib/datasets/utils.py:197-273):
   - 'symmetric': off-diagonal mass n/(C-1) everywhere
   - 'asymmetric': circular pair-flip i -> i+1 (C-1 -> 0) with prob n
   Draws use ``np.random.RandomState(seed).multinomial`` row by row — the
   per-row loop is deliberate: each multinomial consumes a variable amount
   of the RNG stream, so batching would change every subsequent draw.
   - 'real': CIFAR-N human annotations loaded from ``CIFAR-*_human.pt``
     (lib/datasets/utils.py:172-178), gated on file presence.

2. **Caption noise** (lib/datasets/noise_captioning.py): swap an example's
   caption with another example's, chosen uniformly ('random') or among
   examples sharing a noun/category integer ('noun'/'cat' via
   :func:`caption_noise_by_matching`); ``np.random.default_rng(seed)`` call
   order is preserved for parity.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# classification noise


def symmetric_matrix(n_classes: int, noise: float) -> np.ndarray:
    """Uniform confusion: stay with prob 1-n, flip to any other class with
    total prob n (lib/datasets/utils.py:249-273)."""
    p = np.full((n_classes, n_classes), noise / (n_classes - 1))
    np.fill_diagonal(p, 1.0 - noise)
    return p


def pairflip_matrix(n_classes: int, noise: float) -> np.ndarray:
    """'Asymmetric' noise: class i flips to i+1 (wrapping) with prob n
    (lib/datasets/utils.py:223-246)."""
    p = np.eye(n_classes) * (1.0 - noise)
    for i in range(n_classes):
        p[i, (i + 1) % n_classes] += noise
    return p


def apply_transition_noise(y: np.ndarray, transition: np.ndarray, seed: int) -> np.ndarray:
    """Sample noisy labels from a transition matrix.

    RNG parity: one ``multinomial(1, P[y_i], 1)`` draw per example from a
    fresh ``RandomState(seed)``, in index order (lib/datasets/utils.py:197-219).
    """
    assert transition.shape[0] == transition.shape[1]
    assert (transition >= 0).all()
    np.testing.assert_allclose(transition.sum(axis=1), 1.0, atol=1e-12)
    assert y.max() < transition.shape[0]

    stream = np.random.RandomState(seed)
    out = y.copy()
    for i in range(len(y)):
        draw = stream.multinomial(1, transition[y[i], :], 1)[0]
        out[i] = int(np.flatnonzero(draw == 1)[0])
    return out


def load_cifar_n_labels(dataset: str, data_root: str | None = None) -> np.ndarray:
    """CIFAR-N human relabeling ('worse_label' for CIFAR-10, 'noisy_label'
    for CIFAR-100; lib/datasets/utils.py:172-178). ``data_root`` defaults to
    $LEMON_TPU_DATA_ROOT (./data)."""
    import torch

    if data_root is None:
        from lemon_tpu.data.datasets import data_root as _dr

        data_root = str(_dr())

    # order matters: "cifar100".startswith("cifar10") is True
    is_c100 = dataset.startswith("cifar100")
    fname = "CIFAR-100_human.pt" if is_c100 else "CIFAR-10_human.pt"
    key = "noisy_label" if is_c100 else "worse_label"
    path = Path(data_root) / fname
    if not path.exists():
        raise FileNotFoundError(
            f"CIFAR-N labels not found at {path}; download CIFAR-N "
            "(http://noisylabels.com) or use synthetic noise types."
        )
    blob = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(blob[key])


def flip_labels(
    dataset: str,
    noise_type: str,
    noise_level: float,
    y_true: Optional[np.ndarray],
    data_seed: int = 1,
    n_classes: Optional[int] = None,
    data_root: Optional[str] = None,
) -> np.ndarray:
    """Dispatcher matching add_noisy_labels (lib/datasets/utils.py:172-193)."""
    if noise_type == "real":
        labels = np.asarray(load_cifar_n_labels(dataset, data_root))
        if y_true is not None and len(labels) != len(y_true):
            # Reference quirk kept: add_noisy_labels ignores y_true for
            # 'real' noise and always returns the 50k TRAIN annotation
            # file; the cifar*_full TEST split (utils.py:385-393) then
            # reads its first len(test) rows through per-index dataset
            # access — train-row annotations applied to test images.
            # Truncate to reproduce that instead of returning a
            # wrong-length array that breaks the split invariants.
            print(
                f"[lemon_tpu] WARNING: CIFAR-N 'real' noise file has "
                f"{len(labels)} rows for a {len(y_true)}-row split; using "
                f"the first {len(y_true)} (reference behavior — these are "
                f"train-row annotations, not annotations of these images)"
            )
            labels = labels[: len(y_true)]
            assert len(labels) == len(y_true), "CIFAR-N file smaller than the split"
        return labels
    assert y_true is not None
    assert 0 <= noise_level < 1
    y_true = np.asarray(y_true)
    if n_classes is None:
        from lemon_tpu.data.labels import num_classes

        n_classes = num_classes(dataset)
    if noise_type == "symmetric":
        t = symmetric_matrix(n_classes, noise_level)
    elif noise_type == "asymmetric":
        t = pairflip_matrix(n_classes, noise_level)
    else:
        raise NotImplementedError(noise_type)
    if noise_level <= 0:
        return y_true.copy()
    noisy = apply_transition_noise(y_true, t, data_seed)
    actual = (noisy != y_true).mean()
    if actual == 0.0 and noise_level > 0:
        # legitimately possible at low noise_level x small n (the
        # multinomial draws are independent); the reference proceeds
        print("[lemon_tpu] WARNING: noise draw produced no flips")
    print(f"Actual noise {actual:.2f}")
    return noisy


# ---------------------------------------------------------------------------
# caption noise


def caption_noise_random(n_items: int, frac_noise: float = 0.3, seed: int = 42) -> Dict[int, int]:
    """{source index -> index whose caption replaces it}, uniform over other
    rows (lib/datasets/noise_captioning.py:34-42). RNG call order preserved."""
    stream = np.random.default_rng(seed)
    chosen = stream.choice(np.arange(n_items), int(frac_noise * n_items), replace=False)
    swaps: Dict[int, int] = {}
    for i in chosen:
        others = np.delete(np.arange(n_items), i)
        swaps[i] = stream.choice(others, 1)[0]
    return swaps


def caption_noise_by_matching(int_labels: Sequence[Sequence[int]], frac_noise: float = 0.3, seed: int = 42) -> Dict[int, int]:
    """Swap with a sample sharing an integer tag (noun id or COCO category;
    lib/datasets/noise_captioning.py:4-32). Items with no tags can't be
    noised; a source with no co-tagged partner is silently skipped."""
    # Inverted index: tag -> row ids containing it (in row order).
    n = len(int_labels)
    max_tag = max((max(tags) for tags in int_labels if len(tags) > 0), default=-1) + 1
    tag_sets = [set(tags) for tags in int_labels]
    inverted = {t: [i for i in range(n) if t in tag_sets[i]] for t in range(max_tag)}

    stream = np.random.default_rng(seed)
    candidates = [i for i in np.arange(n) if len(int_labels[i]) > 0]
    chosen = stream.choice(candidates, int(frac_noise * n), replace=False)
    swaps: Dict[int, int] = {}
    for i in chosen:
        tag = stream.choice(int_labels[i])
        partners = np.setdiff1d(inverted[tag], [i])
        if len(partners) > 0:
            swaps[i] = stream.choice(partners, 1)[0]
    return swaps


def apply_caption_noise(df, swaps: Dict[int, int]):
    """Apply a swap dict to a metadata frame with a 'sentence' column;
    returns a copy with 'gold_sentence' and 'is_mislabel' columns
    (lib/datasets/noise_captioning.py:44-54). ``is_mislabel`` is derived by
    comparing strings, so swaps between identical captions don't count."""
    out = df.copy()
    out["gold_sentence"] = out["sentence"]
    if swaps:
        src = df.index[list(swaps.keys())]
        dst = df.index[list(swaps.values())]
        out.loc[src, "sentence"] = df.loc[dst, "sentence"].values
    out["is_mislabel"] = out["sentence"] != out["gold_sentence"]
    return out
