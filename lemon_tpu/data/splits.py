"""Deterministic dataset splits.

sklearn's ``train_test_split`` is kept as the splitting engine so that a
given ``data_seed`` reproduces the reference's exact index partitions
(80/10/10 at lib/datasets/utils.py:408-417; 80/20 for the *_full variants
at :389; stratified 50/25/25 for the large-scale sets at :325-347).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from sklearn.model_selection import train_test_split


def split_80_10_10(n: int, data_seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    train_idx, rest = train_test_split(np.arange(n), test_size=0.2, random_state=data_seed)
    val_idx, test_idx = train_test_split(rest, test_size=0.5, random_state=data_seed)
    return train_idx, val_idx, test_idx


def split_80_20(n: int, data_seed: int) -> Tuple[np.ndarray, np.ndarray]:
    train_idx, val_idx = train_test_split(np.arange(n), test_size=0.2, random_state=data_seed)
    return train_idx, val_idx


def stratified_50_25_25(strata: np.ndarray, seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """50/25/25 stratified on a binary/class column (is_clean for
    mini-ImageNet/Stanford Cars; lib/datasets/utils.py:332-338)."""
    idx = np.arange(len(strata))
    train_val, test = train_test_split(idx, random_state=seed, train_size=0.75, stratify=strata)
    train, val = train_test_split(
        train_val, random_state=seed, train_size=0.5 / 0.75, stratify=strata[train_val]
    )
    return train, val, test
