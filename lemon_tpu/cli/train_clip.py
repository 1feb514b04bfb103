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


def batch_iterator(split, tokenizer_ctx, batch_size, image_size, seed):
    """Shuffled epochs of {'pixels', 'tokens'} with random-resized-crop
    augmentation (train_clip_from_scratch.py:116-121 uses
    RandomResizedCrop(224, scale=(0.3, 1.0)))."""
    from lemon_tpu.data.datasets import load_images
    from lemon_tpu.models.tokenizer import tokenize_batch
    rng = np.random.default_rng(seed)
    n = len(split)
    while True:
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            images = load_images(split, idx, decode_size=image_size)
            # host-side random resized crop on the raw uint8 (cheap at
            # synthetic/benchmark sizes; device path handles the resize)
            from lemon_tpu.ops.image import preprocess_device

            pixels = np.asarray(preprocess_device(images, size=image_size))
            tokens = tokenize_batch(list(split.sentence[idx]), tokenizer_ctx)
            yield {"pixels": pixels, "tokens": tokens}


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
