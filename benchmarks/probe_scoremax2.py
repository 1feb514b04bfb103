"""Probe: transposed-blockmax variant of the fused kNN kernel.

The production kernel (ops/scoremax.py) emits bmax as a (B, T/128) row
strip that stays resident across the j sweep — Mosaic forbids dynamic
lane stores at non-128 offsets, so each j merges its 8 lanes into the
strip with a chain of jnp.where over the whole (block_rows, T/128)
block. This probe writes bmax TRANSPOSED, (T/128, B): each j owns an
(8, block_rows) block at sublane offset j*8 (8-aligned stores are
legal), eliminating the strip carry entirely; the consumer pays one
(T/128, B) -> (B, T/128) transpose in XLA instead.

Run: python benchmarks/probe_scoremax2.py  (one TPU process at a time)
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks._timing import timed_scalar
from lemon_tpu.ops.scoremax import MASKED, _dot_t, fused_scores_blockmax

_LANES = 128
# B kept small: the (B, T) fp32 score block is 1GB at 4096 rows and the
# timing loop holds a few in flight (async dispatch).
B, T, D, K = 4096, 65536, 512, 51
BLOCK_ROWS, TILE_COLS = 256, 1024


def _kernel_t(q_ref, db_ref, start_ref, s_ref, bmaxt_ref, *, tile_cols, n_valid, precision):
    j = pl.program_id(1)
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
    local = j * tile_cols + jax.lax.broadcasted_iota(jnp.int32, (bm, tile_cols), 1)
    col = start_ref[0, 0] + local
    s = jnp.where(col < n_valid, s, MASKED)
    n = tile_cols // _LANES
    s_ref[:] = s.reshape(bm, n, _LANES)
    # (bm, n) block maxima -> transposed (n, bm) tile owned by this j
    bmaxt_ref[:] = s.reshape(bm, n, _LANES).max(axis=2).T


@functools.partial(jax.jit, static_argnames=("n_valid", "block_rows", "tile_cols", "precision"))
def fused_t(q, db, start, *, n_valid, block_rows=BLOCK_ROWS, tile_cols=TILE_COLS, precision="highest"):
    b, d = q.shape
    t = db.shape[0]
    kernel = functools.partial(_kernel_t, tile_cols=tile_cols, n_valid=n_valid, precision=precision)
    start_arr = jnp.asarray(start, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(b // block_rows, t // tile_cols),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, tile_cols // _LANES, _LANES), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols // _LANES, block_rows), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((t // _LANES, b), jnp.float32),
        ),
    )(q, db, start_arr)


def two_point(fn, *args, steps=(1, 5)):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        # device work serializes on one stream: fetching the last result
        # forces all n dispatches (dispatch-side timing lies on the relay)
        float(jnp.sum(out[1][:2, :2]))
        return time.perf_counter() - t0
    for n in steps:
        run(n)
    ts = min(run(steps[0]) for _ in range(3))
    tl = min(run(steps[1]) for _ in range(3))
    return (tl - ts) / (steps[1] - steps[0])


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)

    for prec in ("highest", "high"):
        @jax.jit
        def prod(q, db):
            return fused_scores_blockmax(q, db, "ip", n_valid=T, precision=prec)

        @jax.jit
        def trans(q, db):
            s, bt = fused_t(q, db, 0, n_valid=T, precision=prec)
            return s, bt.T  # consumer layout

        @jax.jit
        def trans_raw(q, db):
            return fused_t(q, db, 0, n_valid=T, precision=prec)

        # correctness (free the 1GB score blocks before timing)
        s0, b0 = prod(q, db)
        s1, b1 = trans(q, db)
        assert np.allclose(np.asarray(b0), np.asarray(b1), atol=1e-5), "bmax mismatch"
        del s0, b0, s1, b1
        per_prod = two_point(prod, q, db)
        per_t = two_point(trans, q, db)
        per_traw = two_point(trans_raw, q, db)
        scale = 1e6 / B  # us/row
        print(f"[{prec}] production strip-merge: {per_prod * scale:.2f} us/row | "
              f"transposed+xla-T: {per_t * scale:.2f} | transposed raw: {per_traw * scale:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
