"""Fused kNN candidate-select kernel: in-VMEM one-hot gather + top-k.

STATUS: MEASURED AND REJECTED (round 4) — NOT wired into production.
On-chip at the production geometry (v5e, q 8192 / db 131072 / k 51,
benchmarks/probe_knn_select_fused.py) the kernel is bit-exact vs the
shipped select but 2.4x SLOWER: select stage 5.40 vs 2.21 us/row, full
bf16x3 composition 16.20 vs 26.47 B pairs/s. The VMEM-residency win is
outweighed by (a) the per-row unrolled (k, nb) @ (nb, 128) dots — M=51
starves the MXU where XLA's batched one-hot dot_general amortizes over
all 8192 rows — and (b) the in-kernel k-pass top-k over (8, k, 128)
tiles, far narrower than XLA's batched passes over (8192, k*128). Kept
(with its bit-exactness test, tests/test_knn.py) as the recorded
negative result; the shipped select stays knn/index.py
``_blockmax_select``.

Would have replaced the three-dispatch select tail of the blockmax pipeline
(knn/index.py ``_blockmax_select``: one-hot candidate-gather matmul,
iterative top-k, index reconstruction) with ONE Pallas kernel that
streams the block-major score tiles through VMEM exactly once:

- the (B, k, n_blocks) one-hot gather weights are built **in VMEM** from
  the block ids (an iota compare — never materialized in HBM; the XLA
  composition pays ~0.5 us/row writing+reading the ~1.7 GB one-hot at
  production shapes),
- the candidate matrix (B, k, 128) lives only in VMEM (the XLA path
  round-trips it through HBM),
- the iterative top-k (ops/topk.py algorithm) runs in the same kernel
  over **global column ids**: the caller sorts ``block_ids`` ascending,
  so global ids increase strictly in (slot, lane) scan order and one
  ``min(where(x == max, gid))`` pass realizes lax.top_k's
  first-occurrence rule == FAISS's ascending-index tiebreak directly —
  no post-hoc index-reconstruction dispatch.

Exactness: the gather is a 0/1-weight ``Precision.HIGHEST`` matmul —
each output is one product ``1.0 * s`` plus exact zeros, bit-equal to a
take (the same argument as the XLA one-hot path, knn/index.py). The
top-k semantics match ``jax.lax.top_k`` on the gathered candidates.

Mosaic layout rule (hard-won, round 4): rank-3 arrays whose LANE
(minormost) dim is 1 — ``ids[:, :, None]``, ``keepdims`` reductions to
``(bm, 1, 1)`` — crash the server-side Mosaic lowering with
``Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs. 2)``.
Rank-3 with a size-1 SUBLANE dim (``(bm, 1, 128)``) is fine. So every
broadcast here goes through ``lax.broadcast_in_dim`` from 2-D operands
and every reduction drops to 2-D ``(bm, 1)`` before being broadcast
back up; nothing rank-3 with lane==1 is ever built.

Precondition (same as the landed XLA one-hot gather, knn/index.py):
``sb`` comes from the fused-Pallas score path, so invalid columns hold
the FINITE ``ops/scoremax.MASKED`` sentinel (fp32 min), never -inf — a
literal -inf would NaN-poison the 0-weight products of the gather
matmul (0 * -inf).

FAISS role in the reference: run_lemon.py:166-177,235-236.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = np.float32(-np.inf)
_LANES = 128
_OUT_W = _LANES  # output column budget; k <= 128
_INT_MAX = np.int32(np.iinfo(np.int32).max)
# the finite masked sentinel (== ops/scoremax.MASKED): masked candidates
# arrive at this value; consumption uses -inf, which stays strictly below
_LOWEST = np.float32(np.finfo(np.float32).min)

_bid = jax.lax.broadcast_in_dim


def _select_kernel(sb_ref, ids_ref, vals_ref, gid_ref, cand_ref, *, k: int, nb: int):
    """See the module docstring for the Mosaic layout rules this follows."""
    bm = sb_ref.shape[0]

    ids = ids_ref[:]  # (bm, k) int32, sorted ascending, distinct
    # One-hot gather weights, built in VMEM (never touch HBM): 0/1 fp32.
    blk = jax.lax.broadcasted_iota(jnp.int32, (bm, k, nb), 2)
    onehot = (_bid(ids, (bm, k, nb), (0, 1)) == blk).astype(jnp.float32)
    # Per-row (k, nb) @ (nb, 128) HIGHEST matmuls — bit-exact gather (one
    # 1.0*s product per output plus exact zeros). Unrolled over the small
    # row-block (Mosaic's dot is 2-D), written into a VMEM scratch.
    for r in range(bm):
        cand_ref[r] = jax.lax.dot_general(
            onehot[r],
            sb_ref[r],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # Global column id of every candidate: ids are sorted ascending and
    # distinct, so gids increase strictly in (slot, lane) scan order —
    # min-over-equal-max selects the first occurrence, which is exactly
    # the ascending-database-index tiebreak.
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, k, _LANES), 2)
    gids = _bid(ids, (bm, k, _LANES), (0, 1)) * _LANES + lane  # (bm, k, 128)

    x0 = cand_ref[:]  # masked entries already at the finite sentinel
    out_col = jax.lax.broadcasted_iota(jnp.int32, (bm, 1, _OUT_W), 2)

    def body(j, acc):
        x, vals_acc, gid_acc = acc
        m2 = jnp.max(jnp.max(x, axis=2), axis=1, keepdims=True)  # (bm, 1)
        is_m = x == _bid(m2, (bm, k, _LANES), (0, 1))
        g2 = jnp.min(
            jnp.min(jnp.where(is_m, gids, _INT_MAX), axis=2), axis=1, keepdims=True
        )  # (bm, 1)
        sel = out_col == j
        vals_acc = jnp.where(sel, _bid(m2, (bm, 1, _OUT_W), (0, 2)), vals_acc)
        gid_acc = jnp.where(sel, _bid(g2, (bm, 1, _OUT_W), (0, 2)), gid_acc)
        x = jnp.where(gids == _bid(g2, (bm, k, _LANES), (0, 1)), _NEG_INF, x)
        return x, vals_acc, gid_acc

    _, vals, gid = jax.lax.fori_loop(
        0,
        k,
        body,
        (
            x0,
            jnp.full((bm, 1, _OUT_W), _LOWEST, jnp.float32),
            jnp.full((bm, 1, _OUT_W), _INT_MAX, jnp.int32),
        ),
    )
    # Sentinel-valued outputs (all-masked or padded candidates) -> -inf,
    # the contract _blockmax_select's n_valid pinning keys on.
    vals_ref[:] = jnp.where(vals == _LOWEST, _NEG_INF, vals)
    gid_ref[:] = gid


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def _fused_padded(sb, ids, *, k: int, block_rows: int, interpret: bool):
    b, nb, _ = sb.shape
    kernel = functools.partial(_select_kernel, k=k, nb=nb)
    vals, gid = pl.pallas_call(
        kernel,
        grid=(b // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, nb, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, 1, _OUT_W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1, _OUT_W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, _OUT_W), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, _OUT_W), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((block_rows, k, _LANES), jnp.float32)],
        interpret=interpret,
    )(sb, ids)
    return vals[:, 0, :k], gid[:, 0, :k]


def supports(nb: int, k: int, block_rows: int = 8) -> bool:
    """VMEM fit + layout guard: the sb tile (block_rows x nb x 128 fp32,
    double-buffered) plus the in-VMEM one-hot must fit under ~16 MB, and
    the strictly-increasing-gid argument needs k <= nb distinct ids."""
    if not (0 < k <= _OUT_W and k <= nb):
        return False
    tile = block_rows * nb * _LANES * 4
    onehot = block_rows * k * nb * 4
    return 2 * tile + onehot + 4 * block_rows * k * _LANES <= 13 << 20


def fused_gather_topk(sb, block_ids, k: int, *, block_rows: int = 8, interpret: bool | None = None):
    """(values, global column ids) of the top-k candidates per row.

    ``sb``: (B, n_blocks, 128) block-major scores from the fused-Pallas
    score path (invalid columns at the finite ``ops/scoremax.MASKED``,
    NEVER -inf — see the module docstring); ``block_ids``: (B, k) int32,
    sorted ascending, distinct. Returns values descending (ties by
    ascending global column id) and ids in [0, n_blocks*128). Values that
    were masked come back as -inf. Same float32-min precondition as
    ops/topk.pallas_topk (similarity scores never reach it).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nb, lanes = sb.shape
    assert lanes == _LANES, sb.shape
    assert block_ids.shape == (b, k), (block_ids.shape, b, k)
    pad_b = (-b) % block_rows
    if pad_b:
        # padded rows select block 0 over sentinel scores; sliced off below
        sb = jnp.pad(sb, ((0, pad_b), (0, 0), (0, 0)), constant_values=_LOWEST)
        block_ids = jnp.pad(block_ids, ((0, pad_b), (0, 0)))
    vals, gid = _fused_padded(
        sb, block_ids.astype(jnp.int32), k=k, block_rows=block_rows, interpret=interpret
    )
    if pad_b:
        vals, gid = vals[:b], gid[:b]
    return vals, gid
