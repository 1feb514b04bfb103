"""bf16x3 kNN e2e accuracy gate (round-5 verdict item 5).

bf16x3 (`precision='high'`) is +41% over exact fp32 on the kNN score
matmul (26.6 vs 18.9 B pairs/s, BENCH_NOTES round 4) with 99.9% identical
neighbor sets and 3.5e-6 max score error — but those are neighbor-set
statistics, not end-to-end evidence. This probe runs the FULL detection
pipeline (bench.py's e2e geometry: synthetic_caption, n=20k, k=50)
twice on the real TPU — knn_precision='highest' then 'high' — sharing one
embedding cache so only the kNN + downstream phases differ, and reports:

  - per-split AUROC for each criteria, and the max |delta|
  - max |pred_score| delta across the dataframe
  - knn_search phase wall-clock both ways (the speed side of the trade)

Gate: max AUROC delta <= 1e-3 (the SURVEY §6 parity bar). If it holds,
DetectionConfig.knn_precision='auto' flips to 'high' for non-strict runs.

    python benchmarks/probe_bf16x3_gate.py [--n 20000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--cpu", action="store_true", help="CPU drive (path check only: CPU ignores the precision hint)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench  # reuse the bench e2e geometry exactly
    from lemon_tpu.detect import dataclasses, run_detection

    cache_dir = tempfile.mkdtemp(prefix="bf16x3_gate_")
    base = bench._e2e_config(args.n, cache_dir)

    out = {"n": args.n, "t_unix": round(time.time(), 1)}
    runs = {}
    for prec in ("highest", "high"):
        cfg = dataclasses.replace(base, knn_precision=prec)
        t0 = time.time()
        res = run_detection(cfg)
        wall = time.time() - t0
        runs[prec] = res
        out[f"wall_{prec}"] = round(wall, 2)
        out[f"knn_search_{prec}"] = round(res["phase_timing"].get("knn_search", float("nan")), 3)
        print(f"[{prec}] wall {wall:.1f}s knn_search {out[f'knn_search_{prec}']}s", flush=True)

    # AUROC deltas per criteria/split
    deltas = {}
    for crit, splits in runs["highest"]["agg_results"].items():
        for split in ("val", "test"):
            a = splits[split]["AUROC"]
            b = runs["high"]["agg_results"][crit][split]["AUROC"]
            deltas[f"{crit}/{split}"] = abs(a - b)
    out["auroc_highest"] = {
        f"{c}/{s}": runs["highest"]["agg_results"][c][s]["AUROC"]
        for c in runs["highest"]["agg_results"] for s in ("val", "test")
    }
    out["auroc_delta"] = {k: round(v, 8) for k, v in deltas.items()}
    out["auroc_delta_max"] = max(deltas.values())

    # score-vector delta on the shared rows
    df_a, df_b = runs["highest"]["df"], runs["high"]["df"]
    score_cols = [c for c in df_a.columns if c.endswith("_pred_score")]
    out["score_delta_max"] = max(
        float(np.nanmax(np.abs(df_a[c].to_numpy() - df_b[c].to_numpy()))) for c in score_cols
    )
    out["gate_1e3"] = bool(out["auroc_delta_max"] <= 1e-3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
