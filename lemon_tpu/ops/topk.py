"""Pallas exact top-k over the lane axis (the kNN candidate-select kernel).

XLA's variadic TopK runs at ~1.8 Gelem/s on v5e for the (B, k*128)
candidate matrices produced by the blockmax prefilter (benchmarks/
probe_knn2.py: 3.64 us/row at W=6528 — 1.7x the cost of the exact-kNN
matmul itself). This kernel replaces the sort-based TopK with k
iterative max+mask passes on the VPU: per pass one max-reduce, one
first-occurrence argmax (eq + min-reduce over column ids), and one mask
update, all in VMEM.

Semantics match ``jax.lax.top_k`` exactly: values descending, ties broken
by the lower column index (first occurrence) — the FAISS-compatible
tiebreak the index relies on (knn/index.py; FAISS role:
run_lemon.py:166-177,235-236).
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


_LOWEST = np.float32(np.finfo(np.float32).min)


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, w: int):
    bm = x_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, w), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (bm, _OUT_W), 1)

    # Consume-by-value (set selected entry to -inf) is a no-op on an entry
    # that IS -inf, which would re-select the same column forever on rows
    # with fewer than k finite entries. Mapping input -inf to the lowest
    # FINITE fp32 once on load makes every consumption strictly decreasing,
    # so ties advance by first occurrence exactly like lax.top_k — without
    # carrying a second (bm, w) aliveness array through the loop (which
    # measured +0.8 us/row and doubled kernel VMEM). Outputs equal to the
    # sentinel map back to -inf at the end (a legitimate input value of
    # float32 min would alias — impossible for similarity scores).
    x0 = x_ref[:]
    x0 = jnp.where(x0 == _NEG_INF, _LOWEST, x0)

    def body(j, acc):
        x, vals_acc, idx_acc = acc
        m = jnp.max(x, axis=1, keepdims=True)
        # first-occurrence argmax == ascending-index tiebreak
        idx = jnp.min(jnp.where(x == m, col, w), axis=1, keepdims=True)
        # onehot-accumulate into lane j of the output (2 cheap VPU ops;
        # a dynamic single-lane store per iteration is slower)
        lane = out_col == j
        vals_acc = jnp.where(lane, m, vals_acc)
        idx_acc = jnp.where(lane, idx, idx_acc)
        x = jnp.where(col == idx, _NEG_INF, x)
        return x, vals_acc, idx_acc

    _, vals, idx = jax.lax.fori_loop(
        0,
        k,
        body,
        (
            x0,
            jnp.full((bm, _OUT_W), _NEG_INF, jnp.float32),
            jnp.full((bm, _OUT_W), w, jnp.int32),
        ),
    )
    vals_ref[:] = jnp.where(vals == _LOWEST, _NEG_INF, vals)
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def _pallas_topk_padded(x, *, k: int, block_rows: int, interpret: bool):
    b, w = x.shape
    kernel = functools.partial(_topk_kernel, k=k, w=w)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(b // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_rows, _OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, _OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, _OUT_W), jnp.float32),
            jax.ShapeDtypeStruct((b, _OUT_W), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return vals[:, :k], idx[:, :k]


def supports(w: int, k: int) -> bool:
    """The kernel pays off where XLA's TopK is wide and slow; narrow or
    k>128 cases stay on lax.top_k."""
    return k <= _OUT_W and w >= 4 * _LANES


def pallas_topk(x, k: int, *, block_rows: int = 64, interpret: bool | None = None):
    """Exact (values, indices) top-k along axis 1 of a 2-D fp32 array.

    Drop-in for ``jax.lax.top_k`` (same tie semantics), with ONE
    precondition: inputs must not contain the exact value
    ``np.finfo(np.float32).min`` — it is the kernel's internal stand-in
    for -inf and would come back as -inf in ``vals`` (indices unaffected).
    Similarity/distance scores never reach it. Rows stream
    through VMEM in blocks of ``block_rows``; both dims are padded
    internally, so any (B, W) shape is accepted. Column padding is -inf at
    indices >= W, and since k <= W a row always has W real candidates with
    lower indices, the first-occurrence rule never selects padding.
    ``interpret=None`` auto-selects the Pallas interpreter off-TPU so
    tests exercise the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, w = x.shape
    assert 0 < k <= w, (k, w)
    x = x.astype(jnp.float32)
    pad_w = (-w) % _LANES
    if pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_w)), constant_values=_NEG_INF)
    block_rows = min(block_rows, ((b + 7) // 8) * 8)
    pad_b = (-b) % block_rows
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)), constant_values=_NEG_INF)
    vals, idx = _pallas_topk_padded(x, k=k, block_rows=block_rows, interpret=interpret)
    if pad_b:
        vals, idx = vals[:b], idx[:b]
    return vals, idx
