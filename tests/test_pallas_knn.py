"""Pallas kNN kernels (ops/topk.py, ops/scoremax.py) — interpret-mode
parity on CPU; the compiled path is exercised on hardware by bench.py and
benchmarks/probe_knn2.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lemon_tpu.knn.index import _blockmax_select, _scores_block, numpy_search
from lemon_tpu.ops.scoremax import fused_scores_blockmax
from lemon_tpu.ops.topk import pallas_topk, supports


def test_pallas_topk_matches_lax(rng):
    for b, w, k in [(16, 6528, 51), (7, 640, 5), (33, 999, 64), (8, 512, 512 // 8)]:
        x = rng.standard_normal((b, w)).astype(np.float32)
        x[:, 3] = x[:, 9] = 1.5  # exact ties -> index tiebreak
        x[0, :10] = -np.inf
        x[1, 3:] = -np.inf  # fewer than k finite entries: lax.top_k emits
        # successive distinct -inf columns; the kernel must match
        vs, is_ = pallas_topk(jnp.asarray(x), k)
        rv, ri = jax.lax.top_k(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(is_), np.asarray(ri))


def test_supports_gate():
    assert supports(6528, 51)
    assert not supports(256, 51)  # narrow: XLA wins
    assert not supports(6528, 200)  # k > lane budget


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_fused_scores_blockmax_semantics(rng, metric):
    q = jnp.asarray(rng.standard_normal((10, 32)).astype(np.float32))
    db = jnp.asarray(rng.standard_normal((2048, 32)).astype(np.float32))
    dbsq = jnp.sum(db * db, axis=1) if metric == "l2" else None
    from lemon_tpu.ops.scoremax import MASKED

    s_ref = np.asarray(_scores_block(q, db, metric, dbsq))
    col = 256 + np.arange(2048)[None, :]
    masked = col >= 1900
    s, bm = fused_scores_blockmax(q, db, metric, dbsq, start=256, n_valid=1900)
    s, bm = np.asarray(s).reshape(10, -1), np.asarray(bm)  # (B, NB, 128) block-major out
    # matmul accumulation order differs from XLA at the ulp level; the
    # contract is tolerance-level score equality plus exact internal
    # consistency (bmax is the true blockmax of the emitted scores).
    assert np.allclose(s[~masked.repeat(10, 0)].reshape(10, -1),
                       s_ref[~masked.repeat(10, 0)].reshape(10, -1), rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(bm, s.reshape(10, 16, 128).max(axis=2))
    # mask positions carry the finite sentinel exactly (not -inf: the
    # one-hot candidate gather would turn 0 * -inf into NaN)
    np.testing.assert_array_equal(s == MASKED, np.broadcast_to(masked, s.shape))


def test_fused_tile_cols_divisor(rng):
    # t = 1920 = 15*128 has no 1024-divisor; the wrapper must fall back to
    # a valid tile split instead of asserting.
    q = jnp.asarray(rng.standard_normal((9, 16)).astype(np.float32))
    db = jnp.asarray(rng.standard_normal((1920, 16)).astype(np.float32))
    from lemon_tpu.ops.scoremax import MASKED

    s, bm = fused_scores_blockmax(q, db, "ip")
    s, bm = np.asarray(s), np.asarray(bm)
    # 15 blocks round up to 16 for Mosaic's 8-sublane block constraint;
    # the alignment-padding block is fully MASKED
    assert s.shape == (9, 16, 128) and bm.shape == (9, 16)
    np.testing.assert_array_equal(bm, s.max(axis=2))
    assert (s[:, 15] == MASKED).all() and (bm[:, 15] == MASKED).all()


def test_plan_tile_cols_mosaic_constraint():
    """Every plan satisfies Mosaic's sublane rule: block count per j-step
    divisible by 8, or one full-width step. Includes the 500k-bench shape
    (489 blocks) that crashed the compiled lowering when unplanned."""
    from lemon_tpu.ops.scoremax import plan_tile_cols

    for t in (62592, 65536, 8192, 1920, 640, 128, 500224 // 8 * 8):
        for req in (1024, 384, 2048):
            cols, t_pad = plan_tile_cols(t, req)
            m_pad = t_pad // 128
            c = cols // 128
            assert t_pad >= t and t_pad % 128 == 0
            assert m_pad % c == 0
            assert c % 8 == 0 or c == m_pad, (t, req, cols, t_pad)


def test_blockmax_select_end_to_end_against_numpy_oracle(rng):
    """Fused kernel + pallas top-k as composed by _tiled_search's fast
    path, checked against the numpy exact-search oracle."""
    b, t, d, k = 24, 4 * 51 * 128 // 4, 24, 12  # t = 6528, prefilter-eligible for k=12
    xq = rng.standard_normal((b, d)).astype(np.float32)
    xb = rng.standard_normal((t, d)).astype(np.float32)
    xb[5] = xb[77]  # duplicate rows -> exact score ties across blocks
    s, bmax = fused_scores_blockmax(jnp.asarray(xq), jnp.asarray(xb), "ip")
    out_s, out_i = _blockmax_select(s, bmax, 0, k, use_pallas=False)
    ref_s, ref_i = numpy_search(xb, xq, k, "ip")
    assert np.allclose(np.asarray(out_s), ref_s, rtol=2e-6, atol=1e-5)
    # indices must agree wherever scores are not within tolerance of a
    # neighboring rank (ulp-level reorders of near-ties are acceptable)
    same = np.asarray(out_i) == ref_i
    if not same.all():
        gaps = np.abs(np.diff(ref_s, axis=1))
        # any disagreement must involve a near-tie
        bad = np.argwhere(~same)
        for r, c in bad:
            window = gaps[r, max(c - 1, 0) : c + 1]
            assert window.size and window.min() < 1e-4, (r, c)


def test_fused_path_with_padded_tile_no_nan(rng):
    """Padding columns + the one-hot candidate gather: a -inf mask would
    inject NaN through 0 * -inf in the gather matmul; the finite MASKED
    sentinel must keep results exact and map back to -inf in the padded
    top-k slots."""
    from lemon_tpu.knn.index import _tiled_search

    b, d, k = 16, 32, 12
    n_db = 6700  # pads to 6784 inside the tile; n_valid < padded size
    xq = rng.standard_normal((b, d)).astype(np.float32)
    xb = rng.standard_normal((n_db, d)).astype(np.float32)
    s, i = _tiled_search(jnp.asarray(xq), jnp.asarray(xb), k=k, metric="ip",
                         tile=4 * k * 128, n_valid=n_db, use_pallas=True)
    s, i = np.asarray(s), np.asarray(i)
    assert not np.isnan(s).any()
    ref_s, ref_i = numpy_search(xb, xq, k, "ip")
    np.testing.assert_allclose(s, ref_s, rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(i, ref_i)
    # k > n_valid: padded slots come back as -inf scores
    s2, _ = _tiled_search(jnp.asarray(xq), jnp.asarray(xb[:130]), k=140, metric="ip",
                          tile=140 * 4 * 128, n_valid=130, use_pallas=True)
    s2 = np.asarray(s2)
    assert not np.isnan(s2).any()
    assert np.isneginf(s2[:, 130:]).all()


def test_high_precision_path(rng):
    """precision='high' (bf16x3 opt-in) returns near-identical scores and
    the same top-k set away from ulp ties."""
    xq = rng.standard_normal((8, 64)).astype(np.float32)
    xb = rng.standard_normal((1024, 64)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    from lemon_tpu.knn.index import _tiled_search

    s0, i0 = _tiled_search(jnp.asarray(xq), jnp.asarray(xb), k=5, metric="ip", tile=512, n_valid=1024)
    s1, i1 = _tiled_search(jnp.asarray(xq), jnp.asarray(xb), k=5, metric="ip", tile=512, n_valid=1024, precision="high")
    assert np.allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4, atol=1e-5)
    assert (np.asarray(i0) == np.asarray(i1)).mean() > 0.95


def test_tiled_search_randomized_shape_sweep(rng):
    """Seeded sweep across odd shapes, metrics, tiles, and both gather
    paths vs the numpy oracle — regression armor for the tiling planner,
    sentinel masking, and block-major layout (duplicate rows force exact
    cross-block ties)."""
    from lemon_tpu.knn.index import _tiled_search

    cases = [
        # (n_db, d, k, tile, metric)  — mix of aligned/unaligned sizes
        (1000, 16, 7, 4 * 7 * 128, "ip"),
        (2200, 8, 3, 2048, "l2"),
        (6528, 24, 12, 6528, "ip"),
        (900, 16, 20, 4 * 20 * 128, "l2"),
        (3100, 8, 5, 1024, "ip"),
    ]
    for n_db, d, k, tile, metric in cases:
        xq = rng.standard_normal((9, d)).astype(np.float32)
        xb = rng.standard_normal((n_db, d)).astype(np.float32)
        xb[n_db // 2] = xb[1]  # exact tie across distant indices
        ref_s, ref_i = numpy_search(xb, xq, k, metric)
        for use_pallas in (False, True):
            s, i = _tiled_search(jnp.asarray(xq), jnp.asarray(xb), k=k, metric=metric,
                                 tile=tile, n_valid=n_db, use_pallas=use_pallas)
            s, i = np.asarray(s), np.asarray(i)
            assert not np.isnan(s).any(), (n_db, k, tile, metric, use_pallas)
            want = -ref_s if metric == "l2" else ref_s
            np.testing.assert_allclose(s, want, rtol=2e-5, atol=1e-4,
                                       err_msg=str((n_db, k, tile, metric, use_pallas)))
            same = (i == ref_i).mean()
            assert same == 1.0 or same > 0.98, (n_db, k, tile, metric, use_pallas, same)


def test_sharded_search_with_pallas_path(rng):
    """The fused Pallas kernels compose with the shard_map'd sharded search
    (interpret mode on the CPU mesh; same code path the TPU compiles)."""
    from lemon_tpu.core.mesh import get_mesh
    from lemon_tpu.knn.index import _sharded_search_fn
    import jax.numpy as jnp

    mesh8 = get_mesh()

    k, d, per_shard = 2, 16, 1024  # tile==per_shard >= 4*k*128 -> fuse on
    n = per_shard * 8
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((16, d)).astype(np.float32)
    fn = _sharded_search_fn(mesh8, k, "ip", per_shard, use_pallas=True)
    starts = jnp.arange(8, dtype=jnp.int32) * per_shard
    valid = jnp.full((8,), per_shard, jnp.int32)
    s, i = fn(jnp.asarray(xq), jnp.asarray(xb), starts, valid)
    ref_s, ref_i = numpy_search(xb, xq, k, "ip")
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_fused_path_with_sub_select(rng):
    """The fused kernel + two-level select + pallas top-k composition
    (the round-4 TPU fast path) is exact in interpret mode, including the
    MASKED-sentinel flow through the sub-level group maxes."""
    from lemon_tpu.knn.index import _tiled_search, numpy_search

    n_db, d, k = 2000, 16, 3  # pads to 2048; 4*k*128 = 1536 <= tile
    xb = rng.standard_normal((n_db, d)).astype(np.float32)
    xq = rng.standard_normal((13, d)).astype(np.float32)
    ref_s, ref_i = numpy_search(xb, xq, k, "ip")
    for sub in (16, 32):
        for precision in ("highest", "high"):
            s, i = _tiled_search(
                jnp.asarray(xq), jnp.asarray(xb), k=k, metric="ip",
                tile=2048, n_valid=n_db, use_pallas=True,
                precision=precision, sub=sub,
            )
            np.testing.assert_array_equal(np.asarray(i), ref_i)
            tol = 1e-5 if precision == "highest" else 1e-3
            np.testing.assert_allclose(np.asarray(s), ref_s, rtol=tol, atol=tol)
