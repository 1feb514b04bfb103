"""Zero-shot CLIP-logits baseline.

Reference: lib/baselines/train_zero_shot_clip_baseline.py:190-224 — for a
classification dataset, embed every class prompt once; per image compute
softmax over (1 - distance to each class prompt) and report the confidence
the model assigns to the *noisy* label. Mislabeled examples get low
confidence. The softmax temperature is the knob the README discusses
(README.md:65-70): score = softmax((1 - d) / T).

The reference re-embeds the class prompts for every batch and loops
per-image over a DistanceEvaluator; here the whole phase is two embedding
passes and one (N, C) matmul.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from scipy.special import softmax

from lemon_tpu.baselines.common import BaselineConfig, cache_kwargs, evaluate_scores, setup, split_frame
from lemon_tpu.detect import _is_clf, prompt_fn


def run_zero_shot_logits(cfg: BaselineConfig, out_dir: Optional[Path] = None, splits=None, encoder=None) -> Dict:
    assert _is_clf(cfg), "CLIP-logits baseline requires a classification dataset"
    splits, encoder, label_set = setup(cfg, splits, encoder)
    p = prompt_fn(cfg)
    label_embs = encoder.encode_texts([p(l) for l in label_set])

    t0 = time.time()
    scores = {}
    for sname in ("train", "val", "test"):
        split = splits[sname]
        texts = [p(label_set[int(i) % len(label_set)]) for i in split.y_noisy]
        img, _ = encoder.embed_split(split, texts, **cache_kwargs(cfg, encoder, split, texts))
        if cfg.dist_type == "cosine":
            d = 1.0 - img @ label_embs.T
        elif cfg.dist_type == "euclidean":
            d = ((img[:, None, :] - label_embs[None]) ** 2).sum(-1) ** 0.5
        else:
            raise NotImplementedError(cfg.dist_type)
        conf = softmax((1.0 - d) / cfg.temperature, axis=1)
        scores[sname] = conf[np.arange(len(split)), split.y_noisy % len(label_set)]
    runtime = time.time() - t0

    df = split_frame(cfg, splits, scores)
    # Confidence in the noisy label: LOW for mislabels. Flip the sign for
    # the shared evaluator, which treats high scores as "more mislabeled".
    df["pred_score"] = -df["pred_score"]
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / "dists.npy", np.concatenate([scores[s] for s in ("train", "val", "test")]))
        np.save(out_dir / "runtime.npy", np.array([runtime]))
    return evaluate_scores(df, out_dir)
