"""Pallas fused kNN score matmul + validity mask + 128-lane blockmax.

The exact-kNN hot loop needs, per (query block, DB tile): the fp32 score
block (kept for the candidate gather) and its per-128-column block
maxima (the blockmax prefilter input, knn/index.py:_tile_topk). Through
XLA these are two HBM passes — the matmul materializes the (B, T) block,
then the reduce reads all of it back (measured: matmul 0.033 ns/pair,
+blockmax 0.062; benchmarks/probe_knn2.py). This kernel emits both in one
pass while the score tile is still in VMEM, and also applies the
``n_valid`` column mask (padding columns to -inf) so the caller's masking
pass disappears too.

Score semantics are bit-identical to knn/index.py:_scores_block: fp32
matmul at HIGHEST precision; 'l2' keeps the reference op order
``-((q_sq - 2*ip) + db_sq)`` (negated squared distance, 'higher is
better'). FAISS-role component (run_lemon.py:166-177).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = np.float32(-np.inf)
# Masked (padding) columns come out as the lowest FINITE fp32, not -inf:
# (a) the candidate gather in knn/index.py:_blockmax_select is a one-hot
# matmul, where a 0-weight times -inf would inject NaN (0 * inf = NaN);
# (b) the value coincides with ops/topk.py's internal -inf stand-in, so a
# selected padding column maps back to -inf in the final top-k scores.
# Legitimate similarity scores never reach float32.min.
MASKED = np.float32(np.finfo(np.float32).min)
_LANES = 128


def _dot_t(a, b, precision):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _kernel(q_ref, db_ref, qsq_ref, dbsq_ref, start_ref, nvalid_ref, s_ref, bmax_ref, *, metric, tile_cols, n_valid_static, n_local, precision):
    j = pl.program_id(1)
    n_bmax_lanes = bmax_ref.shape[1]
    if precision == "high":
        # bf16x3: Mosaic can't lower Precision.HIGH, so decompose manually.
        # x = hi + lo with hi = bf16(x); the lo*lo cross term is below fp32
        # ulp for these magnitudes (max score err 3.5e-6 measured on
        # unit-norm embeddings). 3 bf16 MXU passes vs HIGHEST's 6.
        q = q_ref[:]
        db = db_ref[:]
        q_hi = q.astype(jnp.bfloat16)
        db_hi = db.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        db_lo = (db - db_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = jax.lax.Precision.DEFAULT
        ip = _dot_t(q_hi, db_hi, d) + (_dot_t(q_hi, db_lo, d) + _dot_t(q_lo, db_hi, d))
    else:
        ip = _dot_t(q_ref[:], db_ref[:], jax.lax.Precision.HIGHEST)
    if metric == "l2":
        s = -((qsq_ref[:] - 2.0 * ip) + dbsq_ref[:])
    else:
        s = ip
    bm = s.shape[0]
    local = j * tile_cols + jax.lax.broadcasted_iota(jnp.int32, (bm, tile_cols), 1)
    col = start_ref[0, 0] + local
    # two masks: the caller's global validity bound AND this call's own
    # 8-block alignment padding (local >= n_local), which on intermediate
    # tiles of a larger database sits BELOW n_valid in global terms.
    # n_valid is a compile-time constant when the caller passed a Python
    # int (single-device path: Mosaic folds the compare away on interior
    # tiles) and an SMEM runtime scalar otherwise (sharded path: each
    # shard masks by its own valid-row count).
    n_valid = nvalid_ref[0, 0] if n_valid_static is None else n_valid_static
    s = jnp.where((col < n_valid) & (local < n_local), s, MASKED)
    # Stored block-major 3-D: (rows, blocks, 128). The consumer gathers
    # whole 128-lane blocks (knn/index.py:_blockmax_select); emitting that
    # layout here is free in-kernel, while a post-hoc (B, T)->(B, T/128,
    # 128) reshape through XLA physically retiles the array (~1 us/row at
    # tile 64k — measured round 2).
    s_ref[:] = s.reshape(bm, tile_cols // _LANES, _LANES)
    parts = [
        jnp.max(s[:, c * _LANES : (c + 1) * _LANES], axis=1, keepdims=True)
        for c in range(tile_cols // _LANES)
    ]
    bmax = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    # The bmax output block is the full (block_rows, T/128) row strip,
    # resident in VMEM across the j sweep (same block index for every j).
    # Mosaic forbids dynamic lane stores at non-128 offsets, so each j
    # places its tile_cols/128 lanes by rolling a -inf-padded strip into
    # position and max-merging — full-strip aligned stores only.
    n = tile_cols // _LANES

    @pl.when(j == 0)
    def _():
        bmax_ref[:] = jnp.full((bm, n_bmax_lanes), MASKED, jnp.float32)

    if n == n_bmax_lanes:
        bmax_ref[:] = bmax
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (bm, n_bmax_lanes), 1)
        strip = bmax_ref[:]
        for c in range(n):
            strip = jnp.where(lane == j * n + c, parts[c], strip)
        bmax_ref[:] = strip


@functools.partial(
    jax.jit,
    static_argnames=("metric", "n_valid_static", "n_local", "block_rows", "tile_cols", "precision", "interpret"),
)
def _fused_padded(q, db, qsq, dbsq, start, nvalid, *, metric, n_valid_static, n_local, block_rows, tile_cols, precision, interpret):
    b, d = q.shape
    t = db.shape[0]
    kernel = functools.partial(
        _kernel, metric=metric, tile_cols=tile_cols, n_valid_static=n_valid_static,
        n_local=n_local, precision=precision
    )
    return pl.pallas_call(
        kernel,
        grid=(b // block_rows, t // tile_cols),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_cols), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, tile_cols // _LANES, _LANES), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, t // _LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, t // _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(q, db, qsq, dbsq, start, nvalid)


def plan_tile_cols(t: int, requested_cols: int) -> tuple[int, int]:
    """(tile_cols, padded_t) for the j-sweep.

    Mosaic requires the 3-D output block's middle (sublane) dim —
    tile_cols/128 — to be divisible by 8 or equal to the whole padded_t/128
    (lowering _check_block_mappings). Prefer a multiple-of-8 block-count
    divisor of t/128; if t/128 itself fits the requested width, a single
    full-width j-step is also legal; otherwise pad the database rows up to
    the next multiple of 1024 columns (8 blocks) — padding columns are
    masked to MASKED via ``n_valid`` like any other tail."""
    m = t // _LANES
    max_c = max(requested_cols // _LANES, 1)
    best = 0
    for c in range(min(max_c, m), 0, -1):
        if m % c == 0 and c % 8 == 0:
            best = c
            break
    if best:
        return best * _LANES, t
    if m <= max_c:
        return m * _LANES, t  # single full-width step (block == whole dim)
    m_pad = -(-m // 8) * 8
    # largest multiple-of-8 divisor of m_pad within the requested width;
    # when the request is narrower than 8 blocks, 8 is the floor (a mild
    # VMEM overshoot beats an illegal block shape)
    c = 8
    for cand in range(min(max_c, m_pad), 8, -1):
        if m_pad % cand == 0 and cand % 8 == 0:
            c = cand
            break
    return c * _LANES, m_pad * _LANES


def fused_scores_blockmax(
    q,
    db,
    metric: str = "ip",
    db_sqnorm=None,
    *,
    start=0,
    n_valid=None,  # int or traced int32 scalar (per-shard counts)
    # Tiling swept on v5e: (128, 1024) is ~5% faster kernel-alone for fp32
    # but regresses the full bf16x3 search (13.6 -> 12.1 B pairs/s) and
    # buys nothing end-to-end for fp32; (512, *) and (*, 2048) exceed the
    # 16MB VMEM. (256, 1024) is the balanced default.
    block_rows: int = 256,
    tile_cols: int = 1024,
    precision: str = "highest",
    interpret: bool | None = None,
):
    """(masked scores (B, T/128, 128) block-major, blockmax (B, T/128))
    in one fused pass.

    ``db`` rows must be a multiple of 128 (the index pads its tiles);
    query rows are padded internally. Columns at global index
    ``start + j >= n_valid`` come out as ``MASKED`` (lowest finite fp32 —
    see the constant's comment; the select stage maps it back to -inf)
    in both outputs. The outputs may carry MORE blocks than db/128 when
    the j-sweep needs 8-block alignment (plan_tile_cols) — the extra
    blocks are fully MASKED, so block selection never picks them while
    real candidates remain.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d = q.shape
    t = db.shape[0]
    assert t % _LANES == 0, t
    if n_valid is None:
        n_valid = t  # callers pass start=0 in this case
    tile_cols, t_pad = plan_tile_cols(t, tile_cols)
    q = q.astype(jnp.float32)
    db = db.astype(jnp.float32)
    if t_pad != t:
        db = jnp.pad(db, ((0, t_pad - t), (0, 0)))
    if metric == "l2":
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
        dbsq = (db_sqnorm if db_sqnorm is not None else jnp.sum(db * db, axis=1))[None, :]
        if t_pad != t:
            dbsq = jnp.pad(dbsq, ((0, 0), (0, t_pad - t)))
    else:
        qsq = jnp.zeros((b, 1), jnp.float32)
        dbsq = jnp.zeros((1, t_pad), jnp.float32)
    block_rows = min(block_rows, ((b + 7) // 8) * 8)
    pad_b = (-b) % block_rows
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
        qsq = jnp.pad(qsq, ((0, pad_b), (0, 0)))
    start_arr = jnp.asarray(start, jnp.int32).reshape(1, 1)
    n_valid_static = int(n_valid) if isinstance(n_valid, (int, np.integer)) else None
    nvalid_arr = jnp.asarray(0 if n_valid_static is not None else n_valid, jnp.int32).reshape(1, 1)
    s, bmax = _fused_padded(
        q, db, qsq, dbsq, start_arr, nvalid_arr,
        metric=metric, n_valid_static=n_valid_static, n_local=int(t),
        block_rows=block_rows, tile_cols=tile_cols,
        precision=precision, interpret=interpret,
    )
    if pad_b:
        s, bmax = s[:b], bmax[:b]
    return s, bmax
