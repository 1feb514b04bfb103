"""Isolated kNN stage costs on the real TPU (round-2: where exactly does
the non-matmul time go, stage by stage, not cumulatively).

probe_knn.py measures cumulative pipelines; this isolates:
  - jax.lax.top_k on the (B, 512) blockmax matrix (k=51)
  - jax.lax.top_k on the (B, 6528) candidate matrix (k=51)
  - candidate gather take_along_axis
  - matmul alone vs matmul+blockmax (is the reduce fused by XLA?)

Run: python benchmarks/probe_knn2.py  (one TPU process at a time)
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

B, T, D, K = 16384, 65536, 512, 51
_BLOCK = 128
N_BLOCKS = T // _BLOCK


from benchmarks._timing import timed_scalar as timed_scalar  # shared tunnel-safe timing



def two_point(fn, small_args, large_args, n_small, n_large):
    f = jax.jit(fn)
    timed_scalar(f, *small_args)
    timed_scalar(f, *large_args)
    t_small = min(timed_scalar(f, *small_args) for _ in range(3))
    t_large = min(timed_scalar(f, *large_args) for _ in range(3))
    return (t_large - t_small) / (n_large - n_small)  # seconds per row


def report(name, per_row):
    # normalize to the (B, T) tile the production search processes
    ns_per_pair = per_row / T * 1e9
    print(f"{name:28s}: {per_row*1e6:9.2f} us/row  {ns_per_pair:7.4f} ns/pair  ({T/per_row/1e9:6.2f} B pairs/s-equiv)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    hp = jax.lax.Precision.HIGHEST

    # Generate everything on-device: host->device of multi-GB arrays through
    # the tunnel takes minutes (memory: tpu-tunnel-quirks).
    def dev_normal(key, shape):
        return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32), static_argnums=())(jax.random.PRNGKey(key))

    xb = dev_normal(0, (T, D))
    q_s = dev_normal(1, (1024, D))
    q_l = dev_normal(2, (B, D))

    bmax_s = dev_normal(3, (1024, N_BLOCKS))
    bmax_l = dev_normal(4, (B, N_BLOCKS))

    cand_s = dev_normal(5, (1024, K * _BLOCK))
    cand_l = dev_normal(6, (B, K * _BLOCK))

    sb_s = dev_normal(7, (1024, N_BLOCKS, _BLOCK))
    sb_l = dev_normal(8, (B, N_BLOCKS, _BLOCK))

    def dev_ids(key, rows):
        f = jax.jit(lambda k: jnp.sort(jax.random.randint(k, (rows, K), 0, N_BLOCKS, jnp.int32), axis=1))
        return f(jax.random.PRNGKey(key))

    bid_s = dev_ids(9, 1024)
    bid_l = dev_ids(10, B)
    for a in (xb, q_l, bmax_l, cand_l, sb_l, bid_l):
        a.block_until_ready()

    def mm(q, db):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=hp)
        return jnp.sum(s[:, ::512])

    report("matmul only", two_point(mm, (q_s, xb), (q_l, xb), 1024, B))

    def mm_bmax(q, db):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=hp)
        bm = jnp.max(s.reshape(q.shape[0], N_BLOCKS, _BLOCK), axis=2)
        return jnp.sum(bm) + jnp.sum(s[:, ::512])

    report("matmul + blockmax", two_point(mm_bmax, (q_s, xb), (q_l, xb), 1024, B))

    def btopk(bm):
        s, i = jax.lax.top_k(bm, K)
        return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

    report("top_k (B,512) k=51", two_point(btopk, (bmax_s,), (bmax_l,), 1024, B))

    def ctopk(c):
        s, i = jax.lax.top_k(c, K)
        return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

    report("top_k (B,6528) k=51", two_point(ctopk, (cand_s,), (cand_l,), 1024, B))

    def sort_ids(bm):
        _, i = jax.lax.top_k(bm, K)
        return jnp.sum(jnp.sort(i, axis=1)).astype(jnp.float32)

    report("btopk + sort ids", two_point(sort_ids, (bmax_s,), (bmax_l,), 1024, B))

    def gather(sb, bid):
        cand = jnp.take_along_axis(sb, bid[:, :, None], axis=1)
        return jnp.sum(cand)

    report("candidate gather", two_point(gather, (sb_s, bid_s), (sb_l, bid_l), 1024, B))


if __name__ == "__main__":
    main()
