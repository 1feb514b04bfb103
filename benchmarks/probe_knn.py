"""kNN search decomposition on the real TPU (ROADMAP #4: where does the
non-matmul time go at k=51?).

Times the stages of knn/index.py's _tiled_search separately on one
(B=16384, T=65536, D=512) tile: raw matmul, +blockmax, +block topk,
+candidate gather, +final topk, and the production _tiled_search.

Run: python benchmarks/probe_knn.py  (one TPU process at a time)
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from lemon_tpu.knn.index import _tile_topk, _tiled_search

B, T, D, K = 16384, 65536, 512, 51
_BLOCK = 128


from benchmarks._timing import timed_scalar as timed_scalar  # shared tunnel-safe timing



def two_point(fn, q_small, q_large, xb):
    f = jax.jit(fn)
    timed_scalar(f, q_small, xb)
    timed_scalar(f, q_large, xb)
    t_small = min(timed_scalar(f, q_small, xb) for _ in range(3))
    t_large = min(timed_scalar(f, q_large, xb) for _ in range(3))
    per_query = (t_large - t_small) / (q_large.shape[0] - q_small.shape[0])
    return T / per_query  # pairs/s


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    xq = rng.standard_normal((B, D)).astype(np.float32)
    q_small = jnp.asarray(xq[:1024])
    q_large = jnp.asarray(xq)

    hp = jax.lax.Precision.HIGHEST

    def matmul_rowmax(q, db):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=hp)
        return jnp.sum(jnp.max(s, axis=1))

    print(f"matmul+rowmax        : {two_point(matmul_rowmax, q_small, q_large, xb)/1e9:7.2f} B pairs/s", flush=True)

    def matmul_blockmax_topk(q, db):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=hp)
        sb = s.reshape(q.shape[0], T // _BLOCK, _BLOCK)
        bmax = jnp.max(sb, axis=2)
        bscore, bids = jax.lax.top_k(bmax, K)
        return jnp.sum(bscore) + jnp.sum(bids).astype(jnp.float32)

    print(f"+blockmax+blocktopk  : {two_point(matmul_blockmax_topk, q_small, q_large, xb)/1e9:7.2f} B pairs/s", flush=True)

    def with_gather(q, db):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=hp)
        sb = s.reshape(q.shape[0], T // _BLOCK, _BLOCK)
        bmax = jnp.max(sb, axis=2)
        _, bids = jax.lax.top_k(bmax, K)
        bids = jnp.sort(bids, axis=1)
        cand = jnp.take_along_axis(sb, bids[:, :, None], axis=1)
        return jnp.sum(cand)

    print(f"+candidate gather    : {two_point(with_gather, q_small, q_large, xb)/1e9:7.2f} B pairs/s", flush=True)

    def full_tile(q, db):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=hp)
        out_s, out_i = _tile_topk(s, 0, K, T)
        return jnp.sum(out_s) + jnp.sum(out_i).astype(jnp.float32)

    print(f"full _tile_topk      : {two_point(full_tile, q_small, q_large, xb)/1e9:7.2f} B pairs/s", flush=True)

    def production(q, db):
        s, i = _tiled_search(q, db, k=K, metric="ip", tile=T, n_valid=T)
        return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

    print(f"production search    : {two_point(production, q_small, q_large, xb)/1e9:7.2f} B pairs/s", flush=True)


if __name__ == "__main__":
    main()
