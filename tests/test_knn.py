"""kNN kernel parity vs the numpy oracle, including FAISS semantics
(SURVEY.md §4 plan item 2: score signs, tie order, self-exclusion)."""

import numpy as np
import pytest

import jax

from lemon_tpu.core.mesh import get_mesh
from lemon_tpu.knn.index import ExactKnnIndex, numpy_search, train_split_exclusion


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("n,tile", [(100, 32), (1000, 256), (513, 128)])
def test_search_matches_numpy(metric, n, tile):
    rng = np.random.default_rng(42)
    xb = normed(rng, n, 32)
    xq = normed(rng, 37, 32)
    ref_d, ref_i = numpy_search(xb, xq, 7, metric)

    index = ExactKnnIndex(metric=metric, tile=tile)
    index.add(xb)
    d, i = index.search(xq, 7)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)


def test_incremental_add():
    rng = np.random.default_rng(0)
    xb = normed(rng, 300, 16)
    xq = normed(rng, 5, 16)
    index = ExactKnnIndex(metric="ip", tile=64)
    index.add(xb[:100])
    index.add(xb[100:])
    d, i = index.search(xq, 3)
    ref_d, ref_i = numpy_search(xb, xq, 3, "ip")
    np.testing.assert_array_equal(i, ref_i)


def test_self_match_is_first_for_member_queries():
    """A query that is a database row must return itself first (ip metric on
    normalized vectors -> score 1.0), which the reference's k+1 exclusion
    depends on (run_lemon.py:257-263)."""
    rng = np.random.default_rng(1)
    xb = normed(rng, 128, 8)
    index = ExactKnnIndex(metric="ip", tile=32)
    index.add(xb)
    d, i = index.search(xb[:10], 4)
    np.testing.assert_array_equal(i[:, 0], np.arange(10))
    np.testing.assert_allclose(d[:, 0], 1.0, atol=1e-5)

    index_l2 = ExactKnnIndex(metric="l2", tile=32)
    index_l2.add(xb)
    d, i = index_l2.search(xb[:10], 4)
    np.testing.assert_array_equal(i[:, 0], np.arange(10))
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-5)


def test_tie_break_ascending_index():
    xb = np.tile(np.array([[1.0, 0.0]], np.float32), (10, 1))  # all identical
    xq = np.array([[1.0, 0.0]], np.float32)
    index = ExactKnnIndex(metric="ip", tile=4)
    index.add(xb)
    _, i = index.search(xq, 5)
    np.testing.assert_array_equal(i[0], [0, 1, 2, 3, 4])


def test_train_split_exclusion():
    scores = np.arange(12, dtype=np.float32).reshape(2, 6)
    idx = np.arange(12, dtype=np.int32).reshape(2, 6)
    in_comp = np.array([True, False])
    s, i = train_split_exclusion(scores, idx, None, in_comp)
    np.testing.assert_array_equal(i[0], idx[0, 1:])  # member: drop first
    np.testing.assert_array_equal(i[1], idx[1, :5])  # non-member: drop last


def test_sharded_search_matches_numpy():
    """Database sharded over an 8-device CPU mesh; results identical to the
    single-device oracle (SURVEY.md §7 hard part #4)."""
    mesh = get_mesh()
    rng = np.random.default_rng(7)
    xb = normed(rng, 1000, 16)  # not divisible by 8 -> padded shards
    xq = normed(rng, 23, 16)
    for metric in ("ip", "l2"):
        index = ExactKnnIndex(metric=metric, tile=64, mesh=mesh)
        index.add(xb)
        d, i = index.search(xq, 9)
        ref_d, ref_i = numpy_search(xb, xq, 9, metric)
        np.testing.assert_array_equal(i, ref_i)
        np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)


def test_sharded_search_padding_cannot_evict_real_neighbors():
    """Regression: per-shard top-k must mask THIS shard's padding rows
    (zero vectors, score 0 for 'ip' / -||q||^2 for 'l2') before selection.
    Construct a database where every global top-k neighbor lives in the
    heavily-padded last shard with NEGATIVE similarity — a post-hoc mask
    cannot recover them once padding evicts them from the shard's top-k."""
    mesh = get_mesh()
    rng = np.random.default_rng(11)
    n, d, k = 964, 16, 8  # 8 shards of 128 -> last shard 68 real + 60 pad
    xb = np.zeros((n, d), np.float32)
    # shards 0..6 (+ start of shard 7): ip vs e0-queries ~= -1
    xb[:, 0] = -1.0 + rng.uniform(0, 1e-3, n)
    xb[:, 1] = rng.uniform(0, 1e-3, n)
    # the last shard's real rows: the TRUE top-k, at ip ~= -0.5 (< 0, so
    # unmasked padding at score 0 would beat them locally)
    last = slice(7 * 128, n)
    xb[last, 0] = -0.5 + rng.uniform(0, 1e-3, n - 7 * 128)
    xb[last, 2] = 0.75
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = np.zeros((5, d), np.float32)
    xq[:, 0] = 1.0
    xq[:, 3] = rng.uniform(0, 1e-3, 5)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)
    for metric in ("ip", "l2"):
        index = ExactKnnIndex(metric=metric, tile=64, mesh=mesh)
        index.add(xb)
        d_out, i_out = index.search(xq, k)
        ref_d, ref_i = numpy_search(xb, xq, k, metric)
        assert (ref_i >= 7 * 128).all()  # the construction worked
        np.testing.assert_array_equal(i_out, ref_i)
        np.testing.assert_allclose(d_out, ref_d, rtol=1e-5, atol=1e-5)


def test_cpp_backend_matches_numpy():
    """Native host backend (ctypes/C++) parity with the numpy oracle."""
    from lemon_tpu.knn import cpp_backend

    if not cpp_backend.available():
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(11)
    xb = normed(rng, 500, 32)
    xq = normed(rng, 40, 32)
    for metric in ("ip", "l2"):
        d, i = cpp_backend.search(xb, xq, 7, metric)
        ref_d, ref_i = numpy_search(xb, xq, 7, metric)
        np.testing.assert_array_equal(i, ref_i)
        np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-4)

    # pair distances
    pd = cpp_backend.pair_distances(xb[:40], xq, "cosine")
    ref = 1 - np.sum(xb[:40] * xq, axis=1)
    np.testing.assert_allclose(pd, ref, atol=1e-5)


def test_index_cpp_backend_option():
    from lemon_tpu.knn import cpp_backend

    if not cpp_backend.available():
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(12)
    xb = normed(rng, 300, 16)
    xq = normed(rng, 10, 16)
    index = ExactKnnIndex(metric="ip", backend="cpp")
    index.add(xb[:100])
    index.add(xb[100:])
    d, i = index.search(xq, 5)
    ref_d, ref_i = numpy_search(xb, xq, 5, "ip")
    np.testing.assert_array_equal(i, ref_i)


def test_blockmax_prefilter_tie_across_blocks():
    """Ties spanning 128-wide blocks must resolve by ascending index
    through the blockmax prefilter path."""
    rng = np.random.default_rng(13)
    xb = rng.standard_normal((2048, 8)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    # plant identical rows far apart (different 128-blocks)
    for j in [5, 130, 600, 1900]:
        xb[j] = xb[5]
    xq = xb[5:6]
    index = ExactKnnIndex(metric="ip", tile=2048)
    index.add(xb)
    d, i = index.search(xq, 6)
    ref_d, ref_i = numpy_search(xb, xq, 6, "ip")
    np.testing.assert_array_equal(i, ref_i)


def test_k_exceeds_database(rng):
    """k > ntotal pads with -inf scores and out-of-range indices (the
    documented contract; FAISS pads with -1, our callers mask on n_valid)."""
    xb = rng.standard_normal((5, 8)).astype(np.float32)
    xq = rng.standard_normal((3, 8)).astype(np.float32)
    index = ExactKnnIndex(metric="ip")
    index.add(xb)
    s, i = index.search(xq, k=9)
    assert s.shape == (3, 9) and i.shape == (3, 9)
    ref_s, ref_i = numpy_search(xb, xq, 5, "ip")
    np.testing.assert_allclose(s[:, :5], ref_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i[:, :5], ref_i)
    assert np.isneginf(s[:, 5:]).all()
    assert (i[:, 5:] >= 5).all()


def test_duplicate_database_rows(rng):
    """Duplicate rows produce identical scores and ascending-index ties."""
    base = rng.standard_normal((4, 8)).astype(np.float32)
    xb = np.concatenate([base, base])  # every row duplicated
    xq = base[:2] + 0.01 * rng.standard_normal((2, 8)).astype(np.float32)
    index = ExactKnnIndex(metric="ip")
    index.add(xb)
    s, i = index.search(xq, k=8)
    ref_s, ref_i = numpy_search(xb, xq, 8, "ip")
    np.testing.assert_allclose(s, ref_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i, ref_i)


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("sub", [16, 32])
def test_sub_select_matches_numpy(metric, sub):
    """Two-level select (second blockmax at sub-lane granularity) is
    exact: db large enough that the prefilter path runs (t >= 4*k*128)."""
    rng = np.random.default_rng(7)
    xb = normed(rng, 2048, 16)
    xq = normed(rng, 23, 16)
    k = 3  # 4*k*128 = 1536 <= tile -> blockmax path active
    ref_d, ref_i = numpy_search(xb, xq, k, metric)
    index = ExactKnnIndex(metric=metric, tile=2048, select_sub=sub)
    index.add(xb)
    d, i = index.search(xq, k)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)


def test_sub_select_ties_within_and_across_groups():
    """Adversarial ties through BOTH select levels: identical rows planted
    (a) in different sub-groups of the same 128-block, (b) across blocks,
    (c) concentrated inside one 32-lane sub-group — ascending-index
    tiebreak must survive the recursive prefilter."""
    rng = np.random.default_rng(11)
    xb = rng.standard_normal((4096, 8)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    # (a) same block, different sub-groups: 128-block 2 spans 256..383
    xb[260] = xb[300] = xb[370] = xb[5]
    # (b) across blocks
    xb[1500] = xb[2900] = xb[5]
    # (c) one sub-group holds several copies (block 8, lanes 1024..1055)
    xb[1025] = xb[1030] = xb[1031] = xb[5]
    xq = xb[5:6]
    k = 6  # 4*k*128 = 3072 <= 4096
    ref_d, ref_i = numpy_search(xb, xq, k, "ip")
    for sub in (16, 32):
        index = ExactKnnIndex(metric="ip", tile=4096, select_sub=sub)
        index.add(xb)
        d, i = index.search(xq, k)
        np.testing.assert_array_equal(i, ref_i)
        np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)


def test_sub_select_multi_tile_and_padding():
    """sub-select composes with multi-tile scans, n_valid masking and
    k > per-tile candidates; also exercises k not dividing 128/sub."""
    rng = np.random.default_rng(12)
    xb = normed(rng, 5000, 16)  # pads to 5120 over two 2560 tiles
    xq = normed(rng, 9, 16)
    k = 5
    ref_d, ref_i = numpy_search(xb, xq, k, "ip")
    index = ExactKnnIndex(metric="ip", tile=2560, select_sub=32)
    index.add(xb)
    d, i = index.search(xq, k)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)


def test_fused_select_kernel_matches_shipped_select():
    """ops/select.fused_gather_topk (one-kernel gather+topk+recon) is
    bit-exact vs the shipped three-dispatch _blockmax_select, including
    masked tails and duplicate scores (interpret mode on CPU; the on-chip
    probe is benchmarks/probe_knn_select_fused.py)."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.knn.index import _blockmax_select
    from lemon_tpu.ops.scoremax import fused_scores_blockmax
    from lemon_tpu.ops.select import fused_gather_topk, supports

    n_db, d, k, q = 2048, 32, 7, 40
    rng = np.random.default_rng(7)
    xb_h = rng.standard_normal((n_db, d)).astype(np.float32)
    xb_h[100] = xb_h[611]  # duplicate rows -> tie broken by ascending id
    xb, xq = jnp.asarray(xb_h), jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    assert supports(n_db // 128, k)
    for n_valid in (n_db, n_db - 77, 140):  # full, ragged tail, k*128 > n_valid
        sb, bmax = fused_scores_blockmax(xq, xb, "ip", None, start=0, n_valid=n_valid, precision="high")
        a_s, a_i = _blockmax_select(sb, bmax, 0, k, True, gather="onehot", n_valid=n_valid)
        _, bids = jax.lax.top_k(bmax, k)
        f_s, f_i = fused_gather_topk(sb, jnp.sort(bids, axis=1), k)
        f_i = jnp.where(jnp.isneginf(f_s), n_valid, f_i)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(f_i))
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(f_s), rtol=0, atol=0)


def test_device_resident_queries_match_host_queries():
    """search() accepts device-resident (jax.Array) queries — the path
    detect.py uses to share one upload between search and the components
    program — and must return bit-identical results to the host-array
    path; device_array() must expose the exact database rows."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    xb = normed(rng, 300, 32)
    xq = normed(rng, 53, 32)
    index = ExactKnnIndex(metric="ip", tile=128)
    index.add(xb)
    d_host, i_host = index.search(xq, 9)
    d_dev, i_dev = index.search(jnp.asarray(xq), 9)
    np.testing.assert_array_equal(i_dev, i_host)
    np.testing.assert_array_equal(d_dev, d_host)
    np.testing.assert_array_equal(np.asarray(index.device_array()), xb)


def test_device_adopted_database_matches_host_add():
    """add() adopts an already device-resident float32 database without a
    re-upload (detect.py's warm-path device-embedding cache feeds this);
    search results, ntotal, and device_array() must be bit-identical to
    the host-add path, and mixing host chunks afterwards is rejected."""
    import jax.numpy as jnp

    import pytest

    rng = np.random.default_rng(11)
    xb = normed(rng, 260, 32)
    xq = normed(rng, 41, 32)
    host_idx = ExactKnnIndex(metric="ip", tile=128)
    host_idx.add(xb)
    dev_idx = ExactKnnIndex(metric="ip", tile=128)
    dev_arr = jnp.asarray(xb)
    dev_idx.add(dev_arr)
    assert dev_idx.device_array() is dev_arr  # adopted, not copied
    assert dev_idx.ntotal == 260  # known immediately (host path: at finalize)
    d_h, i_h = host_idx.search(xq, 7)
    d_d, i_d = dev_idx.search(xq, 7)
    assert host_idx.ntotal == 260
    np.testing.assert_array_equal(i_d, i_h)
    np.testing.assert_array_equal(d_d, d_h)
    with pytest.raises(AssertionError):
        dev_idx.add(xb)
