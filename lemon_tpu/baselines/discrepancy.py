"""Discrepancy/diversity baseline ("Emphasizing Complementary Samples").

Reference: lib/baselines/discrepancy_baseline.py:164-230. Four scores over
the k nearest *text* neighbors of each example (comparison set = train):

- dis_y / dis_x: mean distance from the query's text/image embedding to the
  second-hop neighborhood (the text-neighbors' own text-neighbors, each
  list self-excluded) — reference :217-224.
- div_y / div_x: mean pairwise distance among the first-hop neighbors'
  text/image embeddings, normalized by k^2 — reference :225-230.

The reference computes these in a per-sample Python loop; here each split
is one gather + einsum program. Note the reference quirk kept for parity:
the train split searches k+1 neighbors and does NOT drop the self-match
from I_m (only the second-hop cache is self-excluded).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from lemon_tpu.baselines.common import BaselineConfig, cache_kwargs, evaluate_scores, setup, split_frame
from lemon_tpu.detect import _texts_for_split
from lemon_tpu.knn import ExactKnnIndex


def _second_hop(cache_idx: np.ndarray, I_m: np.ndarray):
    """For each query row: concatenate the cached (self-excluded) neighbor
    lists of its first-hop neighbors. cache_idx: (N_tr, k) already
    self-excluded; I_m: (B, k_q). Returns (B, k_q * k) index matrix."""
    return cache_idx[I_m].reshape(len(I_m), -1)


def run_discrepancy(cfg: BaselineConfig, out_dir: Optional[Path] = None, splits=None, encoder=None) -> Dict:
    assert cfg.method in ("dis_y", "dis_x", "div_y", "div_x"), (
        f"discrepancy baseline needs method in dis_y|dis_x|div_y|div_x, got {cfg.method!r}"
    )
    splits, encoder, label_set = setup(cfg, splits, encoder)
    k = cfg.knn_k

    train = splits["train"]
    noisy_texts_tr, _, _, _ = _texts_for_split(cfg, train, label_set)
    img_tr, txt_tr = encoder.embed_split(train, noisy_texts_tr, **cache_kwargs(cfg, encoder, train, noisy_texts_tr))

    index_txt = ExactKnnIndex(metric="ip", tile=cfg.knn_tile)
    index_txt.add(txt_tr)

    cache = None
    if cfg.method.startswith("dis"):
        # Second-hop cache: each train row's k text-neighbors, self-excluded
        # (discrepancy_baseline.py:164-169).
        _, c = index_txt.search(txt_tr, k + 1)
        cache = np.empty((len(txt_tr), k), np.int64)
        for i in range(len(c)):
            row = c[i][c[i] != i][:k]
            if len(row) < k:  # self not returned (duplicate embeddings)
                row = np.concatenate([row, c[i][: k - len(row)]])
            cache[i] = row

    t0 = time.time()
    names = ["val", "test"] if (cfg.debug or cfg.skip_train) else ["train", "val", "test"]
    scores = {}
    for sname in names:
        split = splits[sname]
        noisy_texts, _, _, _ = _texts_for_split(cfg, split, label_set)
        if sname == "train":
            img, txt = img_tr, txt_tr
        else:
            img, txt = encoder.embed_split(split, noisy_texts, **cache_kwargs(cfg, encoder, split, noisy_texts))
        _, I_m = index_txt.search(txt, k + (sname == "train"))

        if cfg.method.startswith("dis"):
            hop2 = _second_hop(cache, I_m)  # (B, |I_m| * k)
            ref = txt_tr if cfg.method == "dis_y" else img_tr
            q = txt if cfg.method == "dis_y" else img
            v = 1.0 - np.einsum("bmd,bd->bm", ref[hop2], q)
            scores[sname] = v.mean(axis=1)
        else:
            ref = txt_tr if cfg.method == "div_y" else img_tr
            nb = ref[I_m]  # (B, k(+1), D)
            u = 1.0 - np.einsum("bid,bjd->bij", nb, nb)
            scores[sname] = u.sum(axis=(1, 2)) / k**2
    runtime = time.time() - t0

    df = split_frame(cfg, {s: splits[s] for s in names}, scores)
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / "runtime.npy", np.array([runtime]))
    return evaluate_scores(df, out_dir)
