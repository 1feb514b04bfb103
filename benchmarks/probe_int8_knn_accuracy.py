"""int8 kNN scoring: accuracy feasibility study (CPU, numpy).

The kNN path's measured per-stage floor is the score matmul (~2.2 us/row
fp32-exact, ~1.0 bf16x3 — BENCH_NOTES round 2); int8 runs the MXU ~2x
faster than bf16 at these shapes (probe_pallas_int8). Before building an
int8 score mode, this probe measures what per-vector symmetric int8
quantization of L2-normalized embeddings does to the thing that actually
matters: which neighbor IDs come back.

Simulated score: s_ij = (a_qi . b_qj) * sa_i * sb_j with per-vector
max-abs scales (the row scale sa_i is order-preserving per query; the
COLUMN scales sb_j are where ranking error enters). Agreement is measured
on (a) isotropic unit vectors and (b) anisotropic spiked-covariance
vectors (closer to real CLIP embeddings, whose similarity spread is much
wider), plus (c) the downstream quantity: LEMoN's exp(-tau*D) neighbor
weights.

Run: python benchmarks/probe_int8_knn_accuracy.py   (pure CPU numpy)
"""

from __future__ import annotations

import json

import numpy as np


def unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def make_embeddings(rng, n, d, kind):
    if kind == "isotropic":
        return unit(rng.standard_normal((n, d), dtype=np.float32))
    # spiked covariance: a few dominant directions + isotropic tail, like
    # real encoder output (similarities spread over ~[0, 0.6] rather than
    # concentrating at 0)
    rank = 16
    basis = rng.standard_normal((rank, d), dtype=np.float32)
    coef = rng.standard_normal((n, rank), dtype=np.float32) * 3.0
    tail = rng.standard_normal((n, d), dtype=np.float32)
    return unit(coef @ basis + tail)


def quantize_per_vector(x):
    s = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-12) / 127.0
    q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def topk_ids(scores, k):
    idx = np.argpartition(-scores, k, axis=1)[:, :k]
    # order within top-k by (score desc, id asc) to mirror FAISS/lax.top_k
    row = np.arange(scores.shape[0])[:, None]
    order = np.lexsort((idx, -scores[row, idx]), axis=1)
    return idx[row, order]


def main():
    rng = np.random.default_rng(0)
    nb, nq, d = 16384, 2048, 512
    out = {}
    for kind in ("isotropic", "spiked"):
        xb = make_embeddings(rng, nb, d, kind)
        xq = make_embeddings(rng, nq, d, kind)
        exact = xq @ xb.T
        aq, sa = quantize_per_vector(xq)
        bq, sb = quantize_per_vector(xb)
        approx = (aq.astype(np.int32) @ bq.astype(np.int32).T).astype(np.float32)
        approx *= sa
        approx *= sb.T
        err = np.abs(approx - exact)
        res = {"max_abs_score_err": float(err.max()), "mean_abs_score_err": float(err.mean())}
        for k in (5, 51):
            ids_e = topk_ids(exact, k)
            ids_a = topk_ids(approx, k)
            # set agreement (does the same neighbourhood come back)
            inter = [
                len(set(ids_e[i]) & set(ids_a[i])) / k for i in range(nq)
            ]
            res[f"k{k}_set_agreement"] = float(np.mean(inter))
            res[f"k{k}_exact_rows"] = float(np.mean([x == 1.0 for x in inter]))
            # downstream: LEMoN weights exp(-tau*D) on D = -score (cosine
            # path); relative weight error at tau=5 over the EXACT ids
            row = np.arange(nq)[:, None]
            w_e = np.exp(-5.0 * (-exact[row, ids_e]))
            w_a = np.exp(-5.0 * (-approx[row, ids_e]))
            res[f"k{k}_weight_rel_err"] = float(
                np.max(np.abs(w_a - w_e) / np.maximum(w_e, 1e-30))
            )
        out[kind] = res
        print(kind, json.dumps(res, indent=2), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
