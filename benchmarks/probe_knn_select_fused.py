"""Fused select kernel (ops/select.py) vs the shipped three-dispatch select.

probe_knn_select3 located the shipped select's cost at ~2.56 us/row
(bmax top-k 0.155 + onehot gather ~0.5 + onehot materialization ~0.5 +
iterative top-k ~1.0 + recon ~0.3). ops/select.fused_gather_topk folds
the gather + top-k + recon into ONE Pallas kernel whose one-hot and
candidate tensors never touch HBM. This probe:

  1. asserts bit-exact agreement (values + ids) with _blockmax_select on
     the small batch, including masked tails (n_valid < padded width),
  2. times the select stage in isolation (F vs A) at the production
     geometry (q 8192, db 131072, k 51),
  3. times the full search composition (fused_scores_blockmax + select)
     both ways — the number that moves bench.py's knn legs.

Run: python benchmarks/probe_knn_select_fused.py  (one TPU process at a time)
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

from lemon_tpu.knn.index import _blockmax_select  # noqa: E402
from lemon_tpu.ops.scoremax import fused_scores_blockmax  # noqa: E402
from lemon_tpu.ops.select import fused_gather_topk, supports  # noqa: E402

N_DB, D, K = 131_072, 512, 51
Q_SMALL, Q_LARGE = 1024, 8192
_NEG_INF = np.float32(-np.inf)


@jax.jit
def select_A(sb, bmax):
    return _blockmax_select(sb, bmax, 0, K, True, gather="onehot", n_valid=N_DB)


@jax.jit
def select_F(sb, bmax):
    _, block_ids = jax.lax.top_k(bmax, K)
    block_ids = jnp.sort(block_ids, axis=1)
    out_s, idx = fused_gather_topk(sb, block_ids, K)
    return out_s, jnp.where(jnp.isneginf(out_s), N_DB, idx)


def full_search(select_fn):
    @jax.jit
    def run(q, xb):
        sb, bmax = fused_scores_blockmax(q, xb, "ip", None, start=0, n_valid=N_DB, precision="high")
        return select_fn(sb, bmax)

    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    assert supports(N_DB // 128, K), "production geometry must fit VMEM"
    rng = np.random.default_rng(1)
    xb_h = rng.standard_normal((N_DB, D)).astype(np.float32)
    xb_h /= np.linalg.norm(xb_h, axis=1, keepdims=True)
    xq_h = rng.standard_normal((Q_LARGE, D)).astype(np.float32)
    xq_h /= np.linalg.norm(xq_h, axis=1, keepdims=True)
    xb = jnp.asarray(xb_h)

    staged = {}
    for tag, q_h in (("s", xq_h[:Q_SMALL]), ("l", xq_h)):
        q = jnp.asarray(q_h)
        sb, bmax = fused_scores_blockmax(q, xb, "ip", None, start=0, n_valid=N_DB, precision="high")
        staged[tag] = (jax.block_until_ready(sb), jax.block_until_ready(bmax))

    # correctness: bit-exact vs the shipped select, full-width and masked
    ref_s, ref_i = jax.block_until_ready(select_A(*staged["s"]))
    got_s, got_i = jax.block_until_ready(select_F(*staged["s"]))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=0, atol=0)
    print("correctness: F ids+values bit-match A on the small batch", flush=True)

    # masked tail: recompute a short-db case through both paths
    n_short = N_DB - 77
    sb_m, bm_m = fused_scores_blockmax(
        jnp.asarray(xq_h[:256]), xb, "ip", None, start=0, n_valid=n_short, precision="high"
    )
    a_s, a_i = _blockmax_select(sb_m, bm_m, 0, K, True, gather="onehot", n_valid=n_short)
    _, bids = jax.lax.top_k(bm_m, K)
    f_s, f_i = fused_gather_topk(sb_m, jnp.sort(bids, axis=1), K)
    f_i = jnp.where(jnp.isneginf(f_s), n_short, f_i)
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(f_i))
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(f_s), rtol=0, atol=0)
    print("correctness: masked-tail case matches", flush=True)

    rows = Q_LARGE - Q_SMALL
    results = {}

    def scalarize(fn):
        def run(*args):
            out_s, idx = fn(*args)
            return jnp.sum(out_s) + jnp.sum(idx).astype(jnp.float32)
        return jax.jit(run)

    for name, fn in (("A_select", select_A), ("F_select", select_F)):
        us = two_point(scalarize(fn), staged["s"], staged["l"]) / rows * 1e6
        results[f"{name}_us_row"] = round(us, 3)
        print(f"{name:10s}: {us:6.3f} us/row", flush=True)

    qs, ql = jnp.asarray(xq_h[:Q_SMALL]), jnp.asarray(xq_h)
    for name, fn in (("A_full", full_search(select_A)), ("F_full", full_search(select_F))):
        us = two_point(scalarize(fn), (qs, xb), (ql, xb)) / rows * 1e6
        results[f"{name}_us_row"] = round(us, 3)
        results[f"{name}_Bpairs_s"] = round(N_DB / us / 1e3, 2)
        print(f"{name:10s}: {us:6.3f} us/row  ({N_DB / us / 1e3:.2f} B pairs/s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
