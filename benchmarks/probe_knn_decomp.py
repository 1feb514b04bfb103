"""Per-stage decomposition of the round-4 kNN pipeline (q8192, single
131072-row tile, k=51, d=512) — where do the non-matmul ~3.4 us/row go?

Stages, each timed marginally (two-point over 1024 vs 8192 query rows):

- full           : _tiled_search, the shipped pipeline
- kernel         : fused_scores_blockmax (matmul + mask + blockmax + the
                   full (B, T) score-block HBM store)
- kernel_nostore : a probe-local twin of the scoremax kernel that emits
                   ONLY the blockmax strip — the delta vs `kernel` prices
                   the score-block HBM store (524 KB/row at 128k db),
                   i.e. the ceiling for any in-kernel-select design
- bmax_topk      : lax.top_k over the (B, 1024) block maxima + id sort
- gather         : the candidate gather out of the stored score block
                   (onehot-MXU at precision 'high', take_along at
                   'highest' — exactly knn/index.py's gate)
- final_topk     : iterative Pallas top-k over the (B, k*128) candidates
- select         : _blockmax_select end-to-end (bmax_topk+gather+final_topk
                   + index reconstruction)

Sanity: kernel + select + glue ~= full.

Run: python benchmarks/probe_knn_decomp.py   (one TPU process at a time)
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks._timing import timed_scalar, two_point  # noqa: E402

from lemon_tpu.knn.index import (  # noqa: E402
    _blockmax_select,
    _tiled_search,
    use_pallas_knn,
)
from lemon_tpu.ops.scoremax import (  # noqa: E402
    MASKED,
    _dot_t,
    fused_scores_blockmax,
)
from lemon_tpu.ops.topk import pallas_topk  # noqa: E402

N_DB, D, K = 131_072, 512, 51
Q_SMALL, Q_LARGE = 1024, 8192
LANES = 128


# --- bmax-only kernel twin (no score-block store) -------------------------

def _bmax_kernel(q_ref, db_ref, bmax_ref, *, tile_cols, precision):
    j = pl.program_id(1)
    n_bmax_lanes = bmax_ref.shape[1]
    if precision == "high":
        q = q_ref[:]
        db = db_ref[:]
        q_hi = q.astype(jnp.bfloat16)
        db_hi = db.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        db_lo = (db - db_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = jax.lax.Precision.DEFAULT
        s = _dot_t(q_hi, db_hi, d) + (_dot_t(q_hi, db_lo, d) + _dot_t(q_lo, db_hi, d))
    else:
        s = _dot_t(q_ref[:], db_ref[:], jax.lax.Precision.HIGHEST)
    bm = s.shape[0]
    n = tile_cols // LANES
    parts = [
        jnp.max(s[:, c * LANES : (c + 1) * LANES], axis=1, keepdims=True)
        for c in range(n)
    ]

    @pl.when(j == 0)
    def _():
        bmax_ref[:] = jnp.full((bm, n_bmax_lanes), MASKED, jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, n_bmax_lanes), 1)
    strip = bmax_ref[:]
    for c in range(n):
        strip = jnp.where(lane == j * n + c, parts[c], strip)
    bmax_ref[:] = strip


@functools.partial(jax.jit, static_argnames=("block_rows", "tile_cols", "precision"))
def bmax_only(q, db, *, block_rows=256, tile_cols=1024, precision="highest"):
    b, d = q.shape
    t = db.shape[0]
    kernel = functools.partial(_bmax_kernel, tile_cols=tile_cols, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(b // block_rows, t // tile_cols),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, t // LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t // LANES), jnp.float32),
    )(q, db)


# --- staged pieces mirroring knn/index.py ---------------------------------


@functools.partial(jax.jit, static_argnames=("precision",))
def stage_kernel(q, db, *, precision):
    s, bmax = fused_scores_blockmax(q, db, "ip", None, start=0, n_valid=N_DB, precision=precision)
    return jnp.sum(bmax) + s[0, 0, 0]


@jax.jit
def stage_bmax_topk(bmax):
    _, block_ids = jax.lax.top_k(bmax, K)
    return jnp.sum(jnp.sort(block_ids, axis=1))


@functools.partial(jax.jit, static_argnames=("gather",))
def stage_gather(sb, block_ids, *, gather):
    if gather == "onehot":
        n_blocks = sb.shape[1]
        onehot = (
            block_ids[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_blocks), 2)
        ).astype(jnp.float32)
        cand = jax.lax.dot_general(
            onehot, sb, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
    else:
        cand = jnp.take_along_axis(sb, block_ids[:, :, None], axis=1)
    return jnp.sum(cand)


@jax.jit
def stage_final_topk(cand):
    out_s, pos = pallas_topk(cand, K)
    return jnp.sum(out_s) + jnp.sum(pos).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("gather",))
def stage_select(sb, bmax, *, gather):
    out_s, idx = _blockmax_select(sb, bmax, 0, K, True, gather=gather, n_valid=N_DB)
    return jnp.sum(out_s) + jnp.sum(idx).astype(jnp.float32)


def main():
    print("backend:", jax.default_backend(), flush=True)
    assert use_pallas_knn()
    rng = np.random.default_rng(1)
    xb_h = rng.standard_normal((N_DB, D)).astype(np.float32)
    xb_h /= np.linalg.norm(xb_h, axis=1, keepdims=True)
    xq_h = rng.standard_normal((Q_LARGE, D)).astype(np.float32)
    xq_h /= np.linalg.norm(xq_h, axis=1, keepdims=True)
    xb = jnp.asarray(xb_h)
    q_s = jnp.asarray(xq_h[:Q_SMALL])
    q_l = jnp.asarray(xq_h)

    results = {}
    for precision in ("high", "highest"):
        gather = "onehot" if precision == "high" else "take"
        per_row = {}

        def record(name, dt, rows=Q_LARGE - Q_SMALL):
            us = dt / rows * 1e6
            per_row[name] = us
            results[f"{precision}_{name}_us_row"] = round(us, 3)
            print(f"[{precision}] {name:16s}: {us:6.3f} us/row "
                  f"({N_DB * rows / dt / 1e9:.2f} B pairs/s)", flush=True)

        # full pipeline
        def run_full(q, db):
            s, i = _tiled_search(q, db, k=K, metric="ip", tile=N_DB,
                                 n_valid=N_DB, use_pallas=True, precision=precision)
            return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

        record("full", two_point(run_full, (q_s, xb), (q_l, xb)))

        # fused kernel with + without the score store
        record("kernel", two_point(
            lambda q, db: stage_kernel(q, db, precision=precision), (q_s, xb), (q_l, xb)))
        record("kernel_nostore", two_point(
            lambda q, db: jnp.sum(bmax_only(q, db, precision=precision)), (q_s, xb), (q_l, xb)))

        # materialize staged inputs at both sizes
        staged = {}
        for tag, q in (("s", q_s), ("l", q_l)):
            sb, bmax = fused_scores_blockmax(q, xb, "ip", None, start=0, n_valid=N_DB, precision=precision)
            sb = jax.block_until_ready(sb)
            _, block_ids = jax.lax.top_k(bmax, K)
            block_ids = jnp.sort(block_ids, axis=1)
            if gather == "onehot":
                n_blocks = sb.shape[1]
                onehot = (block_ids[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_blocks), 2)).astype(jnp.float32)
                cand = jax.lax.dot_general(
                    onehot, sb, (((2,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
            else:
                cand = jnp.take_along_axis(sb, block_ids[:, :, None], axis=1)
            staged[tag] = dict(
                sb=sb, bmax=jax.block_until_ready(bmax),
                ids=jax.block_until_ready(block_ids),
                cand=jax.block_until_ready(cand.reshape(q.shape[0], K * LANES)),
            )

        record("bmax_topk", two_point(stage_bmax_topk, (staged["s"]["bmax"],), (staged["l"]["bmax"],)))
        record("gather", two_point(
            lambda sb, ids: stage_gather(sb, ids, gather=gather),
            (staged["s"]["sb"], staged["s"]["ids"]),
            (staged["l"]["sb"], staged["l"]["ids"])))
        record("final_topk", two_point(stage_final_topk, (staged["s"]["cand"],), (staged["l"]["cand"],)))
        record("select", two_point(
            lambda sb, bmax: stage_select(sb, bmax, gather=gather),
            (staged["s"]["sb"], staged["s"]["bmax"]),
            (staged["l"]["sb"], staged["l"]["bmax"])))

        store = per_row["kernel"] - per_row["kernel_nostore"]
        glue = per_row["full"] - per_row["kernel"] - per_row["select"]
        results[f"{precision}_score_store_us_row"] = round(store, 3)
        results[f"{precision}_glue_us_row"] = round(glue, 3)
        print(f"[{precision}] score-block store: {store:.3f} us/row; "
              f"full - kernel - select (glue): {glue:.3f} us/row", flush=True)
        del staged

    print(json.dumps(results))


if __name__ == "__main__":
    main()
