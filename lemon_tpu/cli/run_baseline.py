"""Unified baseline CLI.

The reference ships one script per baseline (lib/baselines/run_clip_sim.py,
train_zero_shot_clip_baseline.py, discrepancy_baseline.py, run_deepknn.py,
training_dependent_baselines.py); here they share one entry point:

    python -m lemon_tpu.cli.run_baseline --baseline discrepancy \
        --method dis_x --dataset mscoco --noise_type cat --output_dir out/d
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np

BASELINES = ("clip_sim", "zero_shot", "discrepancy", "deepknn", "capfilt", "aum", "datamap")


def build_parser() -> argparse.ArgumentParser:
    from lemon_tpu.cli.run_lemon import build_parser as lemon_parser

    p = lemon_parser()
    p.description = "lemon_tpu baselines"
    p.add_argument("--baseline", required=True, choices=BASELINES)
    p.add_argument("--method", default="", help="discrepancy: dis_y|dis_x|div_y|div_x")
    p.add_argument("--temperature", type=float, default=1.0, help="zero-shot softmax temperature")
    p.add_argument("--epochs", type=int, default=10, help="aum/datamap training epochs")
    p.add_argument("--img_base_name", default="clip",
                   choices=["clip", "resnet50", "vit-base-patch16-224", "resnet50_tiny", "vit_tiny"],
                   help="aum/datamap classifier backbone (get_img_base, lib/models/utils.py:49-61); "
                        "*_tiny are test-scale variants")
    p.add_argument("--itm_checkpoint", default=None,
                   help="capfilt: local BLIP-ITM checkpoint dir (falls back to the CLIP proxy head)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from lemon_tpu.core import enable_compilation_cache

    enable_compilation_cache()  # compile-dominated wall-clock on remote TPUs

    from lemon_tpu.baselines.common import BaselineConfig
    from lemon_tpu.core.io import dump_args, env_banner, mark_done, redirect_output

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not args.debug:
        redirect_output(out_dir)
    print(env_banner())
    random.seed(args.seed)
    np.random.seed(args.seed)
    dump_args(out_dir, vars(args))

    # The parser is inherited from run_lemon for flag-name familiarity,
    # but several run_lemon-only flags have no baseline semantics. Refuse
    # non-default values loudly rather than letting args.json record
    # options that silently did nothing.
    unsupported = (
        "normalize_d1", "ablation", "use_discrete_for_text", "real_dataset",
        "subset_val_set", "mesh", "skip_hparam_optim",
        "strict_hparam_parity",
    )
    parser = build_parser()
    for flag in unsupported:
        default = parser.get_default(flag)  # stays in sync with run_lemon's parser
        if getattr(args, flag, default) != default:
            raise SystemExit(f"--{flag} is a run_lemon flag with no effect on baselines; remove it")

    cfg = BaselineConfig(
        dataset=args.dataset, noise_type=args.noise_type, noise_level=args.noise_level,
        dist_type=args.dist_type, clip_model=args.clip_model, knn_k=args.knn_k,
        batch_size=args.batch_size, seed=args.seed, data_seed=args.data_seed,
        debug=args.debug, skip_train=args.skip_train, synthetic_n=args.synthetic_n,
        knn_tile=args.knn_tile, checkpoint=args.checkpoint,
        method=args.method, temperature=args.temperature,
        itm_checkpoint=args.itm_checkpoint,
        # content-keyed, shareable with run_lemon runs over the same data
        embedding_cache=args.embedding_cache,
    )

    if args.baseline == "clip_sim":
        from lemon_tpu.baselines.clip_sim import run_clip_sim as runner
    elif args.baseline == "zero_shot":
        from lemon_tpu.baselines.zero_shot import run_zero_shot_logits as runner
    elif args.baseline == "discrepancy":
        from lemon_tpu.baselines.discrepancy import run_discrepancy as runner
    elif args.baseline == "deepknn":
        from lemon_tpu.baselines.deepknn import run_deepknn as runner
    elif args.baseline == "capfilt":
        from lemon_tpu.baselines.capfilt import run_capfilt as runner
    else:
        from lemon_tpu.baselines.training_dependent import run_training_dependent

        cfg.method = args.baseline  # 'aum' | 'datamap'
        model_cfg = None  # default: our Flax CLIP tower
        if args.img_base_name.startswith("resnet50"):
            from lemon_tpu.models.classifier import TvResNetSpec

            model_cfg = TvResNetSpec.tiny() if args.img_base_name.endswith("_tiny") else TvResNetSpec()
        elif args.img_base_name.startswith("vit"):
            from lemon_tpu.models.torch_backbones import GoogleViTConfig

            model_cfg = GoogleViTConfig.tiny() if args.img_base_name.endswith("_tiny") else GoogleViTConfig()
        run_training_dependent(cfg, out_dir, epochs=args.epochs, model_cfg=model_cfg)
        mark_done(out_dir)
        return

    runner(cfg, out_dir)
    mark_done(out_dir)


if __name__ == "__main__":
    main()
