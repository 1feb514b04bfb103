"""Downstream filter-then-train captioning.

Counterpart of lib/downstream/downstream_captioning.py: filter the training
captions by a detector's scores (percentile threshold, :229-240), fine-tune
a captioner — optionally LoRA-only (:216-224) — with AdamW + warmup-cosine
(:273-277), track best val loss with early stopping (:268-270,381-394),
then generate captions for the test split (:424-440). Also supports the
loss-based detection mode: per-sample LM loss as a mislabel score
(:51-79).

Outputs: captions.pkl (generated + gold), flip_labels.pkl, results.json,
done.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lemon_tpu.core.io import EarlyStopping, json_default
from lemon_tpu.data.datasets import CaptioningSplit, iter_batches, load_images
from lemon_tpu.models.captioner import CaptionerConfig, CaptioningModel, init_captioner, lora_trainable_mask
from lemon_tpu.models.tokenizer import get_tokenizer, tokenize_batch
from lemon_tpu.ops.image import preprocess_device


@dataclasses.dataclass
class CaptionTrainConfig:
    percentile: float = 60.0
    epochs: int = 10
    batch_size: int = 32
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    warmup_frac: float = 0.1
    es_patience: int = 3
    seed: int = 0
    lora_only: bool = False
    model_cfg: CaptionerConfig = dataclasses.field(default_factory=CaptionerConfig.tiny)
    # Local HF Blip2ForConditionalGeneration checkpoint dir: fine-tune from
    # converted pretrained weights (models/blip2.load_blip2) instead of
    # random init — the reference's mode (downstream_captioning.py:216-224).
    blip2_checkpoint: Optional[str] = None


def _tokenize_captions(texts, cfg: CaptionerConfig, blip2_checkpoint: Optional[str] = None):
    """Captions tokenized to the decoder's max_text_len.

    BLIP-2 configs tokenize with the checkpoint's own HF tokenizer when the
    checkpoint dir ships one (the reference's text_processor,
    downstream_captioning.py:324-332); otherwise (tiny architecturally-real
    test checkpoints carry no tokenizer files) a deterministic word-hash
    stand-in with the config's BOS/PAD ids. CLIP-BPE configs keep the
    round-1 behavior: CLIP tokenization, ids clipped into reduced test
    vocabularies."""
    from lemon_tpu.models.blip2 import Blip2Config

    if isinstance(cfg, Blip2Config):
        toks = np.full((len(texts), cfg.max_text_len), cfg.pad_token_id, np.int32)
        toks[:, 0] = cfg.bos_token_id
        tok = _hf_tokenizer(blip2_checkpoint)
        if tok is not None:
            enc = tok(list(texts), truncation=True, padding="max_length",
                      max_length=cfg.max_text_len, return_tensors="np")
            return enc["input_ids"].astype(np.int32)
        import zlib  # crc32: stable across processes, unlike salted hash()

        reserved = max(cfg.pad_token_id, cfg.bos_token_id, cfg.eos_token_id) + 1
        for r, text in enumerate(texts):
            words = str(text).split()[: cfg.max_text_len - 1]
            for c, w in enumerate(words):
                toks[r, c + 1] = reserved + (zlib.crc32(w.encode()) % (cfg.vocab_size - reserved))
        return toks
    toks = tokenize_batch(list(texts), cfg.max_text_len)
    if cfg.vocab_size < 49408:
        tok = get_tokenizer()
        toks = np.where(toks == tok.sot_id, cfg.vocab_size - 2, np.where(toks == tok.eot_id, cfg.vocab_size - 1, toks % (cfg.vocab_size - 2)))
    return toks.astype(np.int32)


def _hf_tokenizer(checkpoint_dir: Optional[str]):
    if not checkpoint_dir:
        return None
    from pathlib import Path as _P

    if not any((_P(checkpoint_dir) / f).exists() for f in ("tokenizer.json", "tokenizer_config.json", "vocab.json")):
        return None
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(checkpoint_dir)


def filter_caption_split(split: CaptioningSplit, scores: np.ndarray, percentile: float) -> CaptioningSplit:
    assert len(scores) == len(split), (len(scores), len(split))
    thres = np.percentile(scores, percentile)
    keep = np.flatnonzero(scores <= thres)
    frac = len(keep) / len(split)
    assert 0.0 < frac <= 1.0, "filter sanity (downstream_captioning.py:237-240)"
    return split.subset(keep)


def per_sample_caption_losses(model: CaptioningModel, params, split: CaptioningSplit, cfg: CaptionTrainConfig) -> np.ndarray:
    """Loss-based detection scores: LM loss of each (image, caption) pair."""
    mc = cfg.model_cfg

    @jax.jit
    def losses(params, pixels, tokens):
        return model.apply(params, pixels, tokens, method=CaptioningModel.per_sample_loss)

    out = np.zeros(len(split), np.float64)
    for idx, n_valid in iter_batches(split, cfg.batch_size):
        pixels = preprocess_device(load_images(split, idx, decode_size=mc.vision.image_resolution), size=mc.vision.image_resolution)
        tokens = jnp.asarray(_tokenize_captions(split.sentence[idx], mc, cfg.blip2_checkpoint))
        out[idx[:n_valid]] = np.asarray(losses(params, pixels, tokens))[:n_valid]
    return out


def train_captioner(
    cfg: CaptionTrainConfig,
    splits: Dict[str, CaptioningSplit],
    detector_scores: Optional[np.ndarray] = None,
    out_dir: Optional[Path] = None,
) -> Dict:
    mc = cfg.model_cfg
    train = splits["train"]
    if detector_scores is not None:
        kept = filter_caption_split(train, detector_scores, cfg.percentile)
        print(f"filter: kept {len(kept)}/{len(train)} captions")
        train = kept

    if cfg.blip2_checkpoint is not None:
        from lemon_tpu.models.blip2 import Blip2Config, load_blip2

        assert isinstance(mc, Blip2Config), "--blip2_checkpoint requires a Blip2Config model_cfg"
        model, params, loaded_cfg = load_blip2(
            cfg.blip2_checkpoint, lora_rank=mc.lora_rank, max_text_len=mc.max_text_len, seed=cfg.seed
        )
        assert loaded_cfg == mc, "model_cfg disagrees with the checkpoint's architecture"
    else:
        model, params = init_captioner(mc, cfg.seed)
    steps_per_epoch = max(len(train) // cfg.batch_size, 1)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate,
        max(int(cfg.warmup_frac * cfg.epochs * steps_per_epoch), 1),
        cfg.epochs * steps_per_epoch,
    )
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    if cfg.lora_only:
        mask = lora_trainable_mask(params)
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, mask
        )
    elif getattr(mc, "freeze_vision", False):
        # stop_gradient zeroes the grads but AdamW's decoupled weight
        # decay would still shrink the frozen tower every step — mask the
        # whole update so the frozen encoder stays bit-stable
        # (models/captioner.py:frozen_vision_mask).
        from lemon_tpu.models.captioner import frozen_vision_mask

        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, frozen_vision_mask(params)
        )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, pixels, tokens, mask):
        def loss_fn(p):
            per = model.apply(p, pixels, tokens, method=CaptioningModel.per_sample_loss)
            m = mask.astype(per.dtype)
            return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def val_loss(params):
        # per-sample losses with the padded rows excluded (the batched
        # mean would double-count iter_batches' repeated pad rows)
        return float(per_sample_caption_losses(model, params, splits["val"], cfg).mean())

    rng = np.random.default_rng(cfg.seed)
    es = EarlyStopping(patience=cfg.es_patience, mode="min")
    es.seed(np.inf, params)  # any real val loss beats the placeholder
    t0 = time.time()
    losses = []  # stays empty for epochs=0 (score/generate from the init)
    for epoch in range(cfg.epochs):
        order = rng.permutation(len(train))
        losses = []
        # static-shape batches: the tail wraps (also when the filtered
        # split is smaller than one batch — previously that trained for
        # ZERO steps and silently returned the random init) and the
        # padded rows are masked out of the loss, so each sample counts
        # exactly once per epoch like the reference's DataLoader.
        for start in range(0, len(order), cfg.batch_size):
            idx = order[start : start + cfg.batch_size]
            n_valid = len(idx)
            if n_valid < cfg.batch_size:
                idx = np.concatenate([idx, np.resize(order, cfg.batch_size - n_valid)])
            pixels = preprocess_device(load_images(train, idx, decode_size=mc.vision.image_resolution), size=mc.vision.image_resolution)
            tokens = jnp.asarray(_tokenize_captions(train.sentence[idx], mc, cfg.blip2_checkpoint))
            mask = jnp.arange(cfg.batch_size) < n_valid
            params, opt_state, loss = train_step(params, opt_state, pixels, tokens, mask)
            losses.append(float(loss))
        vl = val_loss(params)
        print(f"epoch {epoch}: train_loss {np.mean(losses):.4f} val_loss {vl:.4f}")
        es.step(vl, params)
        if es.should_stop:
            print(f"early stop at epoch {epoch}")
            break
    best_params, best_val = es.best_payload, es.best
    runtime = time.time() - t0

    # generate test captions
    from lemon_tpu.models.blip2 import Blip2Config

    if isinstance(mc, Blip2Config):
        bos, eot, pad = mc.bos_token_id, mc.eos_token_id, mc.pad_token_id
        hf_tok = _hf_tokenizer(cfg.blip2_checkpoint)
        decode = (lambda ids: hf_tok.decode(ids).strip()) if hf_tok is not None else (
            lambda ids: " ".join(map(str, ids)))
    else:
        tok = get_tokenizer()
        bos = mc.vocab_size - 2 if mc.vocab_size < 49408 else tok.sot_id
        eot = mc.vocab_size - 1 if mc.vocab_size < 49408 else tok.eot_id
        pad = 0
        decode = (lambda ids: tok.decode(ids).strip()) if mc.vocab_size >= 49408 else (
            lambda ids: " ".join(map(str, ids)))

    @jax.jit
    def gen(params, pixels):
        return model.apply(params, pixels, bos, eot, method=CaptioningModel.generate)

    generated = []
    test = splits["test"]
    for idx, n_valid in iter_batches(test, cfg.batch_size):
        pixels = preprocess_device(load_images(test, idx, decode_size=mc.vision.image_resolution), size=mc.vision.image_resolution)
        toks = np.asarray(gen(best_params, pixels))[:n_valid]
        for row in toks:
            ids = [int(t) for t in row[1:] if t not in (0, pad, bos, eot)]
            generated.append(decode(ids))

    results = {
        "val_loss_best": best_val,
        "runtime_s": runtime,
        "n_train": len(train),
        "train_loss_final": float(np.mean(losses)) if losses else None,
    }
    # Loss-based detection mode (downstream_captioning.py:51-79): the
    # trained captioner's per-sample LM loss is itself a mislabel score.
    det_scores = per_sample_caption_losses(model, best_params, test, cfg)
    flips = np.asarray(test.is_mislabel).astype(int)
    if 0 < flips.sum() < len(flips):
        from lemon_tpu.scoring.metrics import prob_metrics

        results["test_loss_detection_AUROC"] = float(prob_metrics(flips, det_scores)["AUROC"])
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "captions.pkl", "wb") as f:
            pickle.dump({"generated": generated, "gold": list(test.gold_sentence), "noisy": list(test.sentence)}, f)
        with open(out_dir / "flip_labels.pkl", "wb") as f:
            pickle.dump(test.is_mislabel, f)
        np.save(out_dir / "detection_scores.npy", det_scores)
        (out_dir / "results.json").write_text(json.dumps(results, default=json_default))
        (out_dir / "done").write_text("done")
    results["generated"] = generated
    results["params"] = best_params  # in-memory only (results.json above excludes it)
    return results
