"""Real-data AUROC parity harness (BASELINE.json acceptance config 1).

Runs the reference's CPU-runnable acceptance configuration — CIFAR-10,
noise 0.4, ViT-B/32 — end-to-end and prints the test AUROC. Requires on
disk (no network in this environment):

- CIFAR-10 python pickles under $LEMON_TPU_DATA_ROOT (default ./data)
- an openai/clip-vit-base-patch32 checkpoint via
  LEMON_TPU_CKPT_HUGGINGFACE_CLIP (HF CLIPModel .bin/.safetensors or
  OpenAI-format .pt)
- optionally ./data/CIFAR-10_human.pt for --noise_type real

The acceptance bar is AUROC within 0.001 of the reference run with the
same seeds (SURVEY.md §6). Without the checkpoint this script refuses to
run (random weights would make the number meaningless).

    python -m lemon_tpu.cli.parity_check --output_dir out/parity \
        [--noise_type symmetric] [--knn_k 5] [--reference_auroc 0.xxxx]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description="lemon_tpu AUROC parity check")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--dataset", default="cifar10", choices=["cifar10", "cifar100"])
    p.add_argument("--noise_type", default="symmetric", choices=["real", "symmetric", "asymmetric"])
    p.add_argument("--noise_level", type=float, default=0.4)
    p.add_argument("--knn_k", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--reference_auroc", type=float, default=None,
                   help="reference's test AUROC for the same config; asserts |diff| <= tolerance")
    p.add_argument("--tolerance", type=float, default=0.001)
    args = p.parse_args(argv)

    import os

    if not (os.environ.get("LEMON_TPU_CKPT_HUGGINGFACE_CLIP") or
            any((Path(os.environ.get("LEMON_TPU_DATA_ROOT", "./data")) / "checkpoints" / f"huggingface_clip{s}").exists()
                for s in (".npz", ".pt", ".bin", ".safetensors"))):
        sys.exit(
            "parity_check needs a real openai/clip-vit-base-patch32 checkpoint "
            "(set LEMON_TPU_CKPT_HUGGINGFACE_CLIP); refusing to report an AUROC "
            "from random weights."
        )

    from lemon_tpu.cli.run_lemon import main as run_lemon_main

    run_lemon_main([
        "--output_dir", args.output_dir,
        # Reference-identical optimizer path: full grid under the fminbound
        # objective (lib/metrics/utils.py:173-190), so the selected hparams
        # are bit-comparable for the 0.001-AUROC acceptance bar.
        "--strict_hparam_parity",
        "--dataset", args.dataset,
        "--noise_type", args.noise_type,
        "--noise_level", str(args.noise_level),
        "--knn_k", str(args.knn_k),
        "--seed", str(args.seed),
        "--data_seed", str(args.data_seed),
        *(["--platform", args.platform] if args.platform else []),
    ])

    import pickle

    with open(Path(args.output_dir) / "res.pkl", "rb") as f:
        agg = pickle.load(f)["agg_results"]["know_val_labels"]
    auroc = agg["test"]["AUROC"]
    report = {"dataset": args.dataset, "noise_type": args.noise_type,
              "noise_level": args.noise_level, "knn_k": args.knn_k,
              "test_AUROC": auroc, "val_AUROC": agg["val"]["AUROC"]}
    if args.reference_auroc is not None:
        report["reference_AUROC"] = args.reference_auroc
        report["abs_diff"] = abs(auroc - args.reference_auroc)
        report["within_tolerance"] = report["abs_diff"] <= args.tolerance
    print(json.dumps(report))
    (Path(args.output_dir) / "parity.json").write_text(json.dumps(report))
    if args.reference_auroc is not None and not report["within_tolerance"]:
        sys.exit(f"AUROC parity FAILED: |{auroc} - {args.reference_auroc}| > {args.tolerance}")


if __name__ == "__main__":
    main()
