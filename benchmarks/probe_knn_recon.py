"""A/B the production kNN legs after the one-hot index-recon landing.

probe_knn_select3 --f measured the select-stage win in isolation
(take_along recon 3.10 -> one-hot matmul recon 2.56 us/row); this probe
re-measures the PRODUCTION _tiled_search legs at the headline geometry
(q8192 / tile 131072 / k=51) so the BENCH_NOTES table compares
like-for-like against the round-4 pre-recon rows (exact 16.75-17.05,
bf16x3 23.37-24.22 B pairs/s).

Run: python benchmarks/probe_knn_recon.py   (one TPU process at a time)
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

    # exactness first: compiled production path vs the numpy oracle
    qq = xq_h[:256]
    ref_s, ref_i = numpy_search(xb_h, qq, K, "ip")
    s, i = _tiled_search(jnp.asarray(qq), xb, k=K, metric="ip", tile=TILE,
                         n_valid=N_DB, use_pallas=pallas, precision="highest")
    mism = int((np.asarray(i) != ref_i).sum())
    err = float(np.max(np.abs(np.asarray(s) - ref_s)))
    print(f"exactness: id_mismatches={mism}/{ref_i.size} max_score_err={err:.2e}",
          flush=True)

    results = {"id_mismatches": mism, "max_score_err": err}
    for precision in ("highest", "high"):

        def run(xq_dev, xb_arg, precision=precision):
            s, i = _tiled_search(
                xq_dev, xb_arg, k=K, metric="ip", tile=TILE,
                n_valid=N_DB, use_pallas=pallas, precision=precision,
            )
            return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

        dt = two_point(run, (q_small, xb), (q_large, xb))
        rate = N_DB * (Q - Q_SMALL) / dt
        results[precision] = rate
        print(f"{precision:8s}: {rate/1e9:7.2f} B pairs/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
