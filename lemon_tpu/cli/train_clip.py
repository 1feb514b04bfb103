"""Contrastive CLIP training CLI.

Counterpart of train_clip_from_scratch.py: trains a CLIP from scratch on a
captioning dataset (MIMIC-CXR at context 256, CC3M at 77), with the
detection-driven CC3M filtering mode (--cc3m_filtering pointing at a prior
LEMoN run). TPU-native: data-parallel pjit step with global-batch InfoNCE,
random-resized-crop augmentation on device, orbax checkpoints.

    python -m lemon_tpu.cli.train_clip --output_dir out/clip --dataset cc3m
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="lemon_tpu CLIP trainer")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--dataset", default="cc3m",
                   choices=["cc3m", "mimiccxr_caption", "synthetic_caption"])
    p.add_argument("--noise_type", default="random")
    p.add_argument("--noise_level", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "sgd"])
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--total_steps", type=int, default=100_000)
    p.add_argument("--save_interval", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"],
                   help="bf16 = TPU fast path (bf16 compute, fp32 params/LN)")
    p.add_argument("--context_length", type=int, default=None)
    p.add_argument("--cc3m_filtering", default=None, help="prior LEMoN run dir")
    p.add_argument("--cc3m_filtering_n", type=int, default=-1)
    p.add_argument("--platform", default=None)
    p.add_argument("--mesh", default=None,
                   help="DATAxMODEL, e.g. 8x1 (pure DP) or 4x2 (DP + "
                        "Megatron-style tensor parallelism: transformer "
                        "projections shard over the model axis)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in output_dir/ckpt")
    p.add_argument("--synthetic_n", type=int, default=600)
    p.add_argument("--model_size", default="vit_b16", choices=["vit_b16", "vit_b32", "tiny"])
    return p


def _rrc_box(rng, h, w, scale=(0.3, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """torchvision RandomResizedCrop.get_params semantics: 10 attempts of
    (area, log-uniform aspect) sampling, center-crop-with-ratio-clamp
    fallback. Returns (top, left, crop_h, crop_w)."""
    import math

    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            return rng.integers(0, h - ch + 1), rng.integers(0, w - cw + 1), ch, cw
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


class BatchStream:
    """Shuffled epochs of {'pixels', 'tokens'} with RandomResizedCrop
    augmentation — torchvision semantics, matching the reference's
    training transform RandomResizedCrop(224, scale=(0.3, 1.0))
    (train_clip_from_scratch.py:116-121); each crop is bilinear-resized to
    the model input like torchvision's default interpolation.

    Per-sample crop RNG is keyed on (seed, global batch index, slot), so
    ``skip(n)`` can fast-forward a resume by replaying only the shuffle
    bookkeeping — no image decode/augment/tokenize for consumed batches —
    while reproducing the exact crops an uninterrupted run would draw.
    """

    def __init__(self, split, tokenizer_ctx, batch_size, image_size, seed, augment=True):
        self.split = split
        self.tokenizer_ctx = tokenizer_ctx
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.augment = augment
        self._order_rng = np.random.default_rng(seed)
        self._order = None
        self._pos = 0
        self._step = 0

    def _next_idx(self):
        n = len(self.split)
        per_epoch = n // self.batch_size
        assert per_epoch > 0, (
            f"split of {n} rows is smaller than batch_size={self.batch_size}"
        )
        if self._order is None or self._pos >= per_epoch:
            self._order = self._order_rng.permutation(n)
            self._pos = 0
        start = self._pos * self.batch_size
        self._pos += 1
        return self._order[start : start + self.batch_size]

    def skip(self, n_batches: int) -> None:
        for _ in range(int(n_batches)):
            self._next_idx()
            self._step += 1

    def __iter__(self):
        return self

    def __next__(self):
        from PIL import Image

        from lemon_tpu.data.datasets import load_images
        from lemon_tpu.models.tokenizer import tokenize_batch
        from lemon_tpu.ops.image import preprocess_device

        idx = self._next_idx()
        size = self.image_size
        if self.augment:
            crops = []
            raws = load_images(self.split, idx, stack=False)
            for slot, raw in enumerate(raws):
                rng = np.random.default_rng(
                    np.random.SeedSequence([self.seed, self._step, slot])
                )
                top, left, ch, cw = _rrc_box(rng, raw.shape[0], raw.shape[1])
                crop = raw[top : top + ch, left : left + cw]
                im = Image.fromarray(crop).resize((size, size), Image.BILINEAR)
                crops.append(np.asarray(im, np.uint8))
            images = np.stack(crops)
        else:
            images = load_images(self.split, idx, decode_size=size)
        pixels = np.asarray(preprocess_device(images, size=size))
        tokens = tokenize_batch(list(self.split.sentence[idx]), self.tokenizer_ctx)
        self._step += 1
        return {"pixels": pixels, "tokens": tokens}


def batch_iterator(split, tokenizer_ctx, batch_size, image_size, seed, augment=True):
    return BatchStream(split, tokenizer_ctx, batch_size, image_size, seed, augment)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from lemon_tpu.core import enable_compilation_cache

    enable_compilation_cache()  # compile-dominated wall-clock on remote TPUs

    from lemon_tpu.core.io import dump_args, env_banner, mark_done, redirect_output
    from lemon_tpu.data.datasets import get_dataset
    from lemon_tpu.models.clip import ClipConfig
    from lemon_tpu.train.contrastive import TrainConfig, create_train_state, train_loop
    from lemon_tpu.train.filtering import filter_indices_from_run

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    redirect_output(out_dir)
    print(env_banner())
    random.seed(args.seed)
    np.random.seed(args.seed)
    dump_args(out_dir, vars(args))

    train, _, _ = get_dataset(args.dataset, args.data_seed, noise_level=args.noise_level,
                              noise_type=args.noise_type, synthetic_n=args.synthetic_n)
    if args.cc3m_filtering:
        assert args.cc3m_filtering_n > 0
        keep = filter_indices_from_run(args.cc3m_filtering, args.cc3m_filtering_n)
        train = train.subset(np.asarray(keep))
    print(f"Size of training set: {len(train)}")

    ctx = args.context_length or (256 if args.dataset == "mimiccxr_caption" else 77)
    if args.model_size == "tiny":
        model_cfg = ClipConfig.tiny()
    elif args.model_size == "vit_b32":
        model_cfg = ClipConfig.vit_b32()
    else:
        model_cfg = ClipConfig.vit_b16(embed_dim=768, context_length=ctx)

    mesh = None
    if args.mesh:
        from lemon_tpu.core.mesh import distributed_init, get_mesh

        distributed_init()  # no-op single-host; coordinator via env on pods
        d, m = args.mesh.lower().split("x")
        mesh = get_mesh(int(d), int(m))

    tcfg = TrainConfig(
        learning_rate=args.lr, weight_decay=args.weight_decay, optimizer=args.optimizer,
        warmup_steps=args.warmup_steps, total_steps=args.total_steps,
        batch_size=args.batch_size, save_interval=args.save_interval, seed=args.seed,
        precision=args.precision,
    )
    model, state = create_train_state(model_cfg, tcfg, mesh=mesh)
    batches = batch_iterator(train, model_cfg.context_length, args.batch_size,
                             model_cfg.image_resolution, args.seed)
    train_loop(model, state, batches, tcfg, mesh=mesh, ckpt_dir=out_dir / "ckpt",
               resume=args.resume)
    mark_done(out_dir)


if __name__ == "__main__":
    main()
