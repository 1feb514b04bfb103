"""Candidate fixes for the kNN select stage (round 4, after probe_knn_decomp
and probe_knn_select2 located the costs):

  select total 2.65 us/row =
    bmax top-k 0.155 + onehot gather 0.5 (MXU-bound) + ~0.5 onehot
    materialization (unfused in the full program) + iterative top-k 1.0
    (VPU-bound) + 0.32 index reconstruction (XLA take_along on (B, k)!)

Variants, each a single jitted program over (sb, bmax):

- A_baseline   : _blockmax_select as shipped
- B_colids     : top-k kernel takes a per-lane GLOBAL column-id array
                 (broadcast+add from sorted block_ids — no gather) and
                 emits global indices directly; recon disappears
- C_take       : B + take_along_axis gather instead of onehot (re-test at
                 the single-tile geometry; loses at 64k tiles)
- D_split      : B as TWO dispatches (gather program, then topk program) —
                 tests whether the onehot materialization is a
                 program-boundary fusion artifact
- E_pairfold   : B + pair-folded iterative top-k (width w/2, two value
                 arrays + two id arrays, promote-on-consume) — fewer VPU
                 ops per pass at the cost of a setup pass

Correctness of every variant is asserted against _blockmax_select's
output on the small batch before timing.

Run: python benchmarks/probe_knn_select3.py   (one TPU process at a time)
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
from benchmarks._timing import two_point  # noqa: E402

from lemon_tpu.knn.index import _blockmax_select  # noqa: E402
from lemon_tpu.ops.scoremax import MASKED, fused_scores_blockmax  # noqa: E402

N_DB, D, K = 131_072, 512, 51
Q_SMALL, Q_LARGE = 1024, 8192
LANES = 128
_NEG_INF = np.float32(-np.inf)
_LOWEST = np.float32(np.finfo(np.float32).min)
W = K * LANES


# --- col-ids top-k kernel ---------------------------------------------------

def _topk_colids_kernel(x_ref, cid_ref, vals_ref, idx_ref, *, k: int, w: int):
    bm = x_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, w), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 1)
    x0 = x_ref[:]
    x0 = jnp.where(x0 == _NEG_INF, _LOWEST, x0)
    cid = cid_ref[:]

    def body(j, acc):
        x, vals_acc, idx_acc = acc
        m = jnp.max(x, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(x == m, col, w), axis=1, keepdims=True)
        gid = jnp.min(jnp.where(x == m, cid, jnp.int32(2**30)), axis=1, keepdims=True)
        lane = out_col == j
        vals_acc = jnp.where(lane, m, vals_acc)
        idx_acc = jnp.where(lane, gid, idx_acc)
        x = jnp.where(col == pos, _NEG_INF, x)
        return x, vals_acc, idx_acc

    _, vals, idx = jax.lax.fori_loop(
        0, k, body,
        (x0, jnp.full((bm, LANES), _NEG_INF, jnp.float32),
         jnp.full((bm, LANES), jnp.int32(2**30), jnp.int32)),
    )
    vals_ref[:] = jnp.where(vals == _LOWEST, _NEG_INF, vals)
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def topk_colids(x, cid, *, k: int, block_rows: int = 64):
    b, w = x.shape
    kernel = functools.partial(_topk_colids_kernel, k=k, w=w)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(b // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.int32),
        ),
    )(x, cid)
    return vals[:, :k], idx[:, :k]


# --- pair-folded col-ids top-k ---------------------------------------------

def _topk_pair_kernel(x_ref, cid_ref, vals_ref, idx_ref, *, k: int, w: int):
    bm = x_ref.shape[0]
    h = w // 2
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, h), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 1)
    x0 = x_ref[:]
    x0 = jnp.where(x0 == _NEG_INF, _LOWEST, x0)
    cid0 = cid_ref[:]
    # pair fold over contiguous halves (lane-aligned, no shuffles): slot j
    # pairs element j with element j+h. cid is ascending over lanes, so the
    # first-half member always has the lower global id; ties keep it in hi
    # and first-occurrence order is preserved via the gid min below.
    a = x0[:, :h]
    b_ = x0[:, h:]
    ia = cid0[:, :h]
    ib = cid0[:, h:]
    take_a = a >= b_
    hi = jnp.where(take_a, a, b_)
    lo = jnp.where(take_a, b_, a)
    hid = jnp.where(take_a, ia, ib)
    lid = jnp.where(take_a, ib, ia)

    def body(j, acc):
        hi, lo, hid, lid, vals_acc, idx_acc = acc
        m = jnp.max(hi, axis=1, keepdims=True)
        is_m = hi == m
        # among pair-slots with the max value, lowest global id wins
        gid = jnp.min(jnp.where(is_m, hid, jnp.int32(2**30)), axis=1, keepdims=True)
        pos = jnp.min(jnp.where(is_m & (hid == gid), col, h), axis=1, keepdims=True)
        sel = col == pos
        lane = out_col == j
        vals_acc = jnp.where(lane, m, vals_acc)
        idx_acc = jnp.where(lane, gid, idx_acc)
        hi = jnp.where(sel, lo, hi)
        hid = jnp.where(sel, lid, hid)
        lo = jnp.where(sel, _NEG_INF, lo)
        lid = jnp.where(sel, jnp.int32(2**30), lid)
        return hi, lo, hid, lid, vals_acc, idx_acc

    _, _, _, _, vals, idx = jax.lax.fori_loop(
        0, k, body,
        (hi, lo, hid, lid,
         jnp.full((bm, LANES), _NEG_INF, jnp.float32),
         jnp.full((bm, LANES), jnp.int32(2**30), jnp.int32)),
    )
    vals_ref[:] = jnp.where(vals == _LOWEST, _NEG_INF, vals)
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def topk_pair(x, cid, *, k: int, block_rows: int = 64):
    b, w = x.shape
    pad = (-w) % 256  # halves must stay lane-aligned (128) after the fold
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=_NEG_INF)
        cid = jnp.pad(cid, ((0, 0), (0, pad)), constant_values=2**30)
        w += pad
    kernel = functools.partial(_topk_pair_kernel, k=k, w=w)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(b // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.int32),
        ),
    )(x, cid)
    return vals[:, :k], idx[:, :k]


# --- select variants --------------------------------------------------------


def _ids_and_colids(bmax):
    b = bmax.shape[0]
    _, block_ids = jax.lax.top_k(bmax, K)
    block_ids = jnp.sort(block_ids, axis=1)
    cid = (block_ids[:, :, None] * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)).reshape(b, W)
    return block_ids, cid


def _onehot_cand(sb, block_ids):
    n_blocks = sb.shape[1]
    onehot = (
        block_ids[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_blocks), 2)
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, sb, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )


@jax.jit
def select_A(sb, bmax):
    out_s, idx = _blockmax_select(sb, bmax, 0, K, True, gather="onehot", n_valid=N_DB)
    return out_s, idx


def _select_B_cand(sb, bmax):
    block_ids, cid = _ids_and_colids(bmax)
    cand = _onehot_cand(sb, block_ids).reshape(sb.shape[0], W)
    return cand, cid


@jax.jit
def select_B(sb, bmax):
    cand, cid = _select_B_cand(sb, bmax)
    out_s, idx = topk_colids(cand, cid, k=K)
    idx = jnp.where(jnp.isneginf(out_s), N_DB, idx)
    return out_s, idx


@jax.jit
def select_C(sb, bmax):
    block_ids, cid = _ids_and_colids(bmax)
    cand = jnp.take_along_axis(sb, block_ids[:, :, None], axis=1).reshape(sb.shape[0], W)
    # take path carries MASKED sentinels straight through; kernel maps
    # only exact -inf, so pre-map them
    cand = jnp.where(cand == MASKED, _NEG_INF, cand)
    out_s, idx = topk_colids(cand, cid, k=K)
    idx = jnp.where(jnp.isneginf(out_s), N_DB, idx)
    return out_s, idx


@jax.jit
def select_D1(sb, bmax):
    return _select_B_cand(sb, bmax)


@jax.jit
def select_D2(cand, cid):
    out_s, idx = topk_colids(cand, cid, k=K)
    idx = jnp.where(jnp.isneginf(out_s), N_DB, idx)
    return out_s, idx


@jax.jit
def select_E(sb, bmax):
    cand, cid = _select_B_cand(sb, bmax)
    out_s, idx = topk_pair(cand, cid, k=K)
    idx = jnp.where(jnp.isneginf(out_s), N_DB, idx)
    return out_s, idx


def main():
    print("backend:", jax.default_backend(), flush=True)
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

    # correctness on the small batch
    ref_s, ref_i = jax.block_until_ready(select_A(*staged["s"]))
    for name, fn in (("B", select_B), ("C", select_C), ("E", select_E)):
        got_s, got_i = jax.block_until_ready(fn(*staged["s"]))
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i), err_msg=name)
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=0, atol=0, err_msg=name)
    d_cand, d_cid = select_D1(*staged["s"])
    got_s, got_i = jax.block_until_ready(select_D2(d_cand, d_cid))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i), err_msg="D")
    print("correctness: B C D E all match A", flush=True)

    rows = Q_LARGE - Q_SMALL
    results = {}

    def scalarize(fn):
        def run(*args):
            out_s, idx = fn(*args)
            return jnp.sum(out_s) + jnp.sum(idx).astype(jnp.float32)
        return jax.jit(run)

    for name, fn in (("A_baseline", select_A), ("B_colids", select_B),
                     ("C_take", select_C), ("E_pairfold", select_E)):
        dt = two_point(scalarize(fn), staged["s"], staged["l"])
        us = dt / rows * 1e6
        results[f"{name}_us_row"] = round(us, 3)
        print(f"{name:12s}: {us:6.3f} us/row", flush=True)

    # D: two dispatches; time the PAIR by chaining through float() forces
    def run_D(sb, bmax):
        cand, cid = select_D1(sb, bmax)
        out_s, idx = select_D2(cand, cid)
        return jnp.sum(out_s) + jnp.sum(idx).astype(jnp.float32)

    dt = two_point(run_D, staged["s"], staged["l"])
    us = dt / rows * 1e6
    results["D_split_us_row"] = round(us, 3)
    print(f"{'D_split':12s}: {us:6.3f} us/row", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()


# --- F: baseline select but recon via tiny one-hot matmul -------------------


@jax.jit
def select_F(sb, bmax):
    from lemon_tpu.ops.topk import pallas_topk

    b = sb.shape[0]
    _, block_ids = jax.lax.top_k(bmax, K)
    block_ids = jnp.sort(block_ids, axis=1)
    cand = _onehot_cand(sb, block_ids).reshape(b, W)
    out_s, pos = pallas_topk(cand, K)
    slot = pos // LANES
    oh = (slot[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)).astype(jnp.float32)
    slot_ids = jax.lax.dot_general(
        oh, block_ids.astype(jnp.float32)[:, :, None], (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )[:, :, 0].astype(jnp.int32)
    idx = slot_ids * LANES + pos % LANES
    idx = jnp.where(jnp.isneginf(out_s), N_DB, idx)
    return out_s, idx


def main_f():
    print("backend:", jax.default_backend(), flush=True)
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
    ref_s, ref_i = jax.block_until_ready(select_A(*staged["s"]))
    got_s, got_i = jax.block_until_ready(select_F(*staged["s"]))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
    print("correctness: F matches A", flush=True)

    rows = Q_LARGE - Q_SMALL

    def scalarize(fn):
        def run(*args):
            out_s, idx = fn(*args)
            return jnp.sum(out_s) + jnp.sum(idx).astype(jnp.float32)
        return jax.jit(run)

    for name, fn in (("A_baseline", select_A), ("F_ohrecon", select_F)):
        dt = two_point(scalarize(fn), staged["s"], staged["l"])
        print(f"{name:12s}: {dt / rows * 1e6:6.3f} us/row", flush=True)


if __name__ == "__main__" and "--f" in sys.argv:
    main_f()
