"""Decompose the WARM e2e 20k detection run (round 4).

Bench context: warm e2e (embedding cache hit) measured 18.4-24.4 s on
TPU and ~18.5 s on CPU — near-identical across backends, i.e.
host-dominated. The decomposition this probe produced located the cost:
~10.5 s eager synthetic-image rendering per run_detection call + ~3.6 s
imports + the PhaseTimer stages. The render (and the pixel-bytes md5 in
the cache key) was removed from warm runs by LazyRenderUint8Store +
generator-fingerprint cache keys (data/streaming.py round 4); this probe
now verifies the fix: warm runs must show ~zero untimed host cost beyond
dataset metadata synthesis + encoder init + npz load.

Stages reported:
  1. dataset synthesis (get_dataset — now lazy, no pixels)
  2. encoder construction
  3. embedding-cache KEY computation (now a generator fingerprint)
  4. the PhaseTimer stages (knn_search, components, hparam_*, eval)

Run: python benchmarks/probe_e2e_warm.py [n]   (one TPU process at a time!)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def t(label, fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    dt = time.perf_counter() - t0
    print(f"  {label:<28} {dt:8.2f} s", flush=True)
    return out, dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    import os

    os.environ["LEMON_TPU_PRECISION"] = "bf16"
    import jax  # noqa: F401

    from lemon_tpu.data.datasets import get_dataset
    from lemon_tpu.detect import (
        DetectionConfig,
        _cache_kwargs,
        _texts_for_split,
        run_detection,
    )
    from lemon_tpu.models.registry import create_encoder

    print(f"backend: {jax.default_backend()}  n={n}", flush=True)
    cache_dir = tempfile.mkdtemp(prefix="lemon_probe_emb_")
    cfg = DetectionConfig(
        dataset="synthetic_caption",
        noise_type="random",
        noise_level=0.4,
        clip_model="huggingface_clip",
        knn_k=50,
        batch_size=256,
        synthetic_n=n,
        skip_train=True,
        embedding_cache=cache_dir,
        grid={"beta": [0, 5, 20, 100], "gamma": [0, 5, 20, 100], "tau_1": [0, 1, 5, 10], "tau_2": [0, 1, 5, 10]},
    )

    try:
        print("— pre-stage costs (host) —", flush=True)
        splits, _ = t("get_dataset", get_dataset, cfg.dataset, cfg.data_seed,
                      noise_level=cfg.noise_level, noise_type=cfg.noise_type, synthetic_n=n)
        train, val, test = splits
        print(f"  split sizes: train={len(train)} val={len(val)} test={len(test)}", flush=True)
        encoder, _ = t("create_encoder", create_encoder, cfg.clip_model, seed=cfg.seed,
                       batch_size=cfg.batch_size)
        texts_v, _, _, _ = _texts_for_split(cfg, val, None)
        _, dt_key = t("cache_key(val split)", lambda: _cache_kwargs(cfg, encoder, val, texts_v))
        base = getattr(val.images, "_store", None)
        if base is not None and getattr(base, "_data", "n/a") is None:
            print("  -> key computed WITHOUT rendering pixels (fingerprint path)", flush=True)

        print("— cold run —", flush=True)
        t0 = time.perf_counter()
        res = run_detection(cfg)
        print(f"  cold total {time.perf_counter() - t0:8.2f} s", flush=True)
        print(f"  phase_timing: {json.dumps(res['phase_timing'])}", flush=True)

        for i in range(2):
            print(f"— warm run {i + 1} —", flush=True)
            t0 = time.perf_counter()
            res = run_detection(cfg)
            wall = time.perf_counter() - t0
            timing = res["phase_timing"]
            print(f"  warm total {wall:8.2f} s", flush=True)
            print(f"  phase_timing: {json.dumps(timing)}", flush=True)
            print(f"  untimed (dataset synth + encoder init + io): {wall - sum(timing.values()):.2f} s", flush=True)
            auroc = res["agg_results"]["know_val_labels"]["test"]["AUROC"]
            print(f"  test AUROC {float(auroc):.4f}", flush=True)
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
