"""Two-level select A/B at the round-4 single-tile geometry.

After the q_chunk/tile sweep (probe_knn_qchunk: exact 13.0 -> 17.0,
bf16x3 17.7 -> 23.4 B pairs/s at q8192/tile 131072), the largest
non-matmul stage is the final iterative top-k over the k*128 = 6528
gathered candidates (ops/topk.py: k VPU passes over the width). The
two-level select (knn/index.py select_sub_width) applies the blockmax
argument recursively at ``sub``-lane granularity, shrinking that width
to k*sub at the cost of a group-max fold + a k-wide lax.top_k over
k*128/sub + one small gather. This probe A/Bs sub in {0, 16, 32} for
both score precisions at the production geometry.

MEASURED (round 4, v5e): sub-select LOSES at this geometry — exact
16.75 -> 13.59 (sub16) / 12.53 (sub32) B pairs/s; bf16x3 24.22 -> 20.44
/ 17.32. The extra take_along gather + gmax top_k cost more than the
narrower iterative top-k saves. Correctness on chip: sub32 ids are
bit-identical to sub0 (same kernel scores; follow-up check, 0/13056
mismatches, max |ds| = 0); both deviate from the NUMPY oracle at 2/13056
slots with max score err 1.19e-7 — the pre-existing, documented Pallas
accumulation-order ulp near-ties (knn/index.py use_pallas_knn note), not
a select bug. Decision: default sub=0, knob retained.

Run: python benchmarks/probe_knn_subsel.py   (one TPU process at a time)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks._timing import two_point  # noqa: E402

from lemon_tpu.knn.index import _tiled_search, numpy_search, use_pallas_knn  # noqa: E402

N_DB, D, K, Q_SMALL, Q = 131_072, 512, 51, 1024, 8192
TILE = 131_072


def main():
    print("backend:", jax.default_backend(), flush=True)
    pallas = use_pallas_knn()
    rng = np.random.default_rng(1)
    xb_h = rng.standard_normal((N_DB, D)).astype(np.float32)
    xb_h /= np.linalg.norm(xb_h, axis=1, keepdims=True)
    xq_h = rng.standard_normal((Q, D)).astype(np.float32)
    xq_h /= np.linalg.norm(xq_h, axis=1, keepdims=True)
    xb = jnp.asarray(xb_h)
    q_small, q_large = jnp.asarray(xq_h[:Q_SMALL]), jnp.asarray(xq_h)

    results = {}
    for precision in ("highest", "high"):
        for sub in (0, 16, 32):
            tag = f"{precision}_sub{sub}"

            def run(xq_dev, xb_arg, precision=precision, sub=sub):
                s, i = _tiled_search(
                    xq_dev, xb_arg, k=K, metric="ip", tile=TILE,
                    n_valid=N_DB, use_pallas=pallas, precision=precision,
                    sub=sub,
                )
                return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

            dt = two_point(run, (q_small, xb), (q_large, xb))
            rate = N_DB * (Q - Q_SMALL) / dt
            results[tag] = rate
            print(f"{tag:22s}: {rate/1e9:7.2f} B pairs/s", flush=True)

    # on-chip exactness spot check for the winner geometry (compiled, not
    # interpret): ids must match the numpy oracle bit-for-bit at sub=32
    qq = xq_h[:256]
    ref_s, ref_i = numpy_search(xb_h, qq, K, "ip")
    s, i = _tiled_search(jnp.asarray(qq), xb, k=K, metric="ip", tile=TILE,
                         n_valid=N_DB, use_pallas=pallas, precision="highest", sub=32)
    ids_equal = bool((np.asarray(i) == ref_i).all())
    err = float(np.max(np.abs(np.asarray(s) - ref_s)))
    results["sub32_ids_equal"] = ids_equal
    results["sub32_max_score_err"] = err
    print(f"sub32 on-chip exactness: ids_equal={ids_equal} max_score_err={err:.2e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
