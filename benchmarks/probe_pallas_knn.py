"""Hardware validation + timing for the Pallas kNN kernels (ops/topk.py,
ops/scoremax.py) vs the XLA path, at bench.py shapes.

Tunnel-safe: on-device data generation, scalar-fetch forcing, two-point
timing (memory: tpu-tunnel-quirks).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.knn.index import _tiled_search, auto_tile
from lemon_tpu.ops.scoremax import fused_scores_blockmax
from lemon_tpu.ops.topk import pallas_topk

N_DB, D, K, Q = 131_072, 512, 51, 16_384


from benchmarks._timing import timed_scalar as timed  # shared tunnel-safe timing



def main():
    print("backend:", jax.default_backend(), flush=True)

    def dev_normal(key, shape):
        f = jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))
        x = f(jax.random.PRNGKey(key))
        x.block_until_ready()
        return x

    # --- correctness: pallas_topk compiled vs lax.top_k ------------------
    x = dev_normal(0, (512, 6528))
    pv, pi = pallas_topk(x, K, interpret=False)
    rv, ri = jax.lax.top_k(x, K)
    pv, pi, rv, ri = map(np.asarray, (pv, pi, rv, ri))
    assert np.array_equal(pv, rv), "pallas_topk values mismatch"
    assert np.array_equal(pi, ri), "pallas_topk indices mismatch"
    print("pallas_topk compiled: exact match", flush=True)

    # --- correctness: fused scores+blockmax compiled ----------------------
    q = dev_normal(1, (256, D))
    db = dev_normal(2, (8192, D))
    for metric in ("ip", "l2"):
        dbsq = jnp.sum(db * db, axis=1) if metric == "l2" else None
        s, bm = fused_scores_blockmax(q, db, metric, dbsq, start=128, n_valid=8000, interpret=False)
        s, bm = np.asarray(s).reshape(256, -1), np.asarray(bm)  # block-major out
        from lemon_tpu.knn.index import _scores_block
        from lemon_tpu.ops.scoremax import MASKED

        s_ref = np.asarray(_scores_block(q, db, metric, dbsq))
        col = np.broadcast_to(128 + np.arange(8192)[None, :], s.shape)
        # Mosaic's fp32 MXU accumulation order differs from XLA's
        # (measured max abs diff 2.3e-5 at |s|~20); identical rows still
        # get identical scores, so tie-breaking is unaffected.
        assert np.allclose(s[col < 8000], s_ref[col < 8000], rtol=2e-5, atol=1e-4), metric
        assert (s[col >= 8000] == MASKED).all(), metric
        assert np.array_equal(bm, s.reshape(256, 64, 128).max(axis=2)), metric
        print(f"fused_scores_blockmax compiled [{metric}]: ok", flush=True)

    # --- end-to-end equality: pallas vs XLA tiled search ------------------
    xb = dev_normal(3, (N_DB, D))
    xq = dev_normal(4, (Q, D))
    tile = auto_tile(N_DB, Q)
    print("tile:", tile, flush=True)
    s0, i0 = _tiled_search(xq[:2048], xb, k=K, metric="ip", tile=tile, n_valid=N_DB, use_pallas=False)
    s1, i1 = _tiled_search(xq[:2048], xb, k=K, metric="ip", tile=tile, n_valid=N_DB, use_pallas=True)
    s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
    same = (i0 == i1).mean()
    print(f"index agreement pallas-vs-xla: {same:.6f} (ulp near-ties excepted)", flush=True)
    assert np.allclose(s0, s1, rtol=2e-5, atol=1e-4)
    assert same > 0.9999, same

    # --- timing ------------------------------------------------------------
    def make_run(use_pallas, precision="highest"):
        @jax.jit
        def run(xq_dev, xb_arg):
            s, i = _tiled_search(xq_dev, xb_arg, k=K, metric="ip", tile=tile, n_valid=N_DB, use_pallas=use_pallas, precision=precision)
            return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

        return run

    small, large = xq[:1024], xq
    for name, run in (
        ("xla", make_run(False)),
        ("pallas", make_run(True)),
        ("pallas+bf16x3", make_run(True, "high")),
    ):
        timed(run, small, xb)
        timed(run, large, xb)
        ts = min(timed(run, small, xb) for _ in range(3))
        tl = min(timed(run, large, xb) for _ in range(3))
        rate = N_DB * (Q - 1024) / max(tl - ts, 1e-9)
        print(f"{name}: {rate/1e9:.2f} B pairs/s (k={K})", flush=True)


if __name__ == "__main__":
    main()
