"""CapFilt baseline: image-text-matching (ITM) head scores.

Counterpart of lib/baselines/run_capfilt_baseline.py: per (image, caption)
pair, the probability that the pair matches under a BLIP ITM head
(Salesforce/blip-itm-base-coco, :35-70); mislabel score = 1 - P(match).

The ITM model itself is outside this framework's TPU compute path (BLIP's
cross-attention tower); the scorer is pluggable:

- ``itm_score_fn(images_u8, captions) -> P(match) array`` — any scorer.
- :func:`hf_blip_itm_scorer` builds one from a local HuggingFace BLIP-ITM
  checkpoint (host torch; gated on availability).
- :func:`clip_itm_proxy` — a CLIP-similarity proxy head (sigmoid of scaled
  cosine), usable with any encoder in this framework.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from lemon_tpu.baselines.common import BaselineConfig, evaluate_scores, setup, split_frame
from lemon_tpu.data.datasets import iter_batches, load_images
from lemon_tpu.detect import _texts_for_split


def hf_blip_itm_scorer(checkpoint_path: str, batch_size: int = 16) -> Callable:
    """ITM scorer from a local BLIP-ITM checkpoint directory (no network)."""
    import torch
    from transformers import AutoProcessor, BlipForImageTextRetrieval

    processor = AutoProcessor.from_pretrained(checkpoint_path)
    model = BlipForImageTextRetrieval.from_pretrained(checkpoint_path).eval()

    def score(images_u8, captions):
        out = []
        for start in range(0, len(captions), batch_size):
            imgs = [images_u8[i] for i in range(start, min(start + batch_size, len(captions)))]
            caps = list(captions[start : start + len(imgs)])
            inputs = processor(images=imgs, text=caps, return_tensors="pt", padding=True, truncation=True)
            with torch.no_grad():
                logits = model(**inputs).itm_score  # (B, 2): [no-match, match]
            out.append(torch.softmax(logits, dim=1)[:, 1].numpy())
        return np.concatenate(out)

    return score


def clip_itm_proxy(encoder, scale: float = 10.0) -> Callable:
    """P(match) ~ sigmoid(scale * cosine) with this framework's CLIP."""

    def score(images_u8, captions):
        if isinstance(images_u8, (list, tuple)) and len({np.asarray(a).shape for a in images_u8}) > 1:
            # heterogeneous raw sizes (real caption corpora): unify on
            # host with the reference-exact PIL transform before stacking
            from lemon_tpu.ops.image import pil_resize_crop_u8

            size = encoder.cfg.image_resolution
            images_u8 = [pil_resize_crop_u8(a, size) for a in images_u8]
        img = encoder.encode_images(np.asarray(images_u8))
        txt = encoder.encode_texts(list(captions))
        sim = np.sum(img * txt, axis=1)
        return 1.0 / (1.0 + np.exp(-scale * sim))

    return score


def run_capfilt(
    cfg: BaselineConfig,
    out_dir: Optional[Path] = None,
    splits=None,
    encoder=None,
    itm_score_fn: Optional[Callable] = None,
) -> Dict:
    splits, encoder, label_set = setup(cfg, splits, encoder)
    if itm_score_fn is None:
        ckpt = cfg.itm_checkpoint
        if ckpt:
            if not Path(ckpt).exists():
                # an explicit checkpoint must not silently degrade to a
                # different baseline method (the CLIP proxy head)
                raise SystemExit(f"--itm_checkpoint does not exist: {ckpt}")
            itm_score_fn = hf_blip_itm_scorer(ckpt)
        else:
            print("[capfilt] no BLIP-ITM checkpoint; using the CLIP ITM proxy head")
            itm_score_fn = clip_itm_proxy(encoder)

    t0 = time.time()
    scores, loss_dict = {}, {}
    for sname in ("train", "val", "test"):
        split = splits[sname]
        noisy_texts, _, _, _ = _texts_for_split(cfg, split, label_set)
        p_match = np.zeros(len(split))
        for idx, n_valid in iter_batches(split, cfg.batch_size):
            # per-image list: real corpora have heterogeneous raw sizes —
            # the HF BLIP processor resizes each itself (like the
            # reference feeding PIL images), and the CLIP proxy unifies
            # ragged lists on host (clip_itm_proxy)
            images = load_images(split, idx, stack=False)
            p = itm_score_fn(images, [noisy_texts[i] for i in idx])
            p_match[idx[:n_valid]] = p[:n_valid]
        scores[sname] = 1.0 - p_match  # high = mismatch = likely mislabel
        loss_dict[sname] = p_match
    runtime = time.time() - t0

    df = split_frame(cfg, splits, scores)
    if out_dir is not None:
        import pickle

        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "full_loss_dict.pkl", "wb") as f:
            pickle.dump(loss_dict, f)
        with open(out_dir / "flip_labels.pkl", "wb") as f:
            pickle.dump({s: splits[s].is_mislabel for s in splits}, f)
        np.save(out_dir / "runtime.npy", np.array([runtime]))
    return evaluate_scores(df, out_dir)
