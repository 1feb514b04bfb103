"""Exact k-nearest-neighbor search with FAISS-compatible semantics.

Replaces the reference's FAISS ``IndexFlatIP``/``IndexFlatL2``
(run_lemon.py:166-177,235-236) with a TPU-native design:

- **Semantics** (parity-critical, SURVEY.md §7 hard part #2):
  - metric 'ip': scores are inner products, returned descending — on
    L2-normalized embeddings this is cosine similarity, which the caller
    negates (run_lemon.py:270,286).
  - metric 'l2': scores are *squared* euclidean distances, ascending.
  - ties broken by ascending database index (deterministic; makes the
    reference's drop-first self-exclusion rule well-defined).
- **Execution**: one jitted program — the query block is multiplied against
  the database in tiles streamed through a ``lax.scan`` carrying a running
  top-k, so the full (B, N) score matrix never materializes in HBM. The
  matmul rides the MXU; top-k merge uses XLA's TPU TopK over the
  (k + tile) concatenation.
- **Scale-out**: the database axis shards over the mesh's devices via
  ``shard_map`` (each chip owns N/n_dev rows); per-shard top-k results are
  all-gathered (k ≤ 51 → tiny) and merged on every chip. This is the
  framework's sequence-parallelism analog (SURVEY.md §5) and removes the
  reference's 50k comparison-set cap (run_lemon.py:48,122-127).

A pure-numpy implementation (:func:`numpy_search`) is the parity oracle for
tests.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lemon_tpu.core.mesh import DATA_AXIS, pad_to_multiple
from lemon_tpu.ops.scoremax import MASKED as _MASKED
from lemon_tpu.ops.scoremax import fused_scores_blockmax
from lemon_tpu.ops.topk import pallas_topk
from lemon_tpu.ops.topk import supports as _topk_supports

_NEG_INF = np.float32(-np.inf)


def search_q_chunk(default: int = 8192) -> int:
    """Query-chunk size for index searches (env LEMON_TPU_KNN_QCHUNK).

    At a fixed score-block memory budget the select stage's cost per query
    row scales with the NUMBER of database tiles (block-topk, candidate
    gather, iterative top-k, and the cross-tile merge all run once per
    tile), and tiles shrink as the query chunk grows: n_tiles =
    ceil(4*q_chunk*N / budget). Halving the round-2/3 chunk of 16384 to
    8192 doubles the tile to 128k rows, making a 128k database
    single-tile — the entire select stage runs ONCE per row and the merge
    disappears, while the score matmul (already MXU-bound at B=8192)
    is unaffected. Swept on v5e in benchmarks/probe_knn_qchunk.py
    (round 4); query chunks dispatch async so per-chunk overhead stays
    amortized."""
    return int(os.environ.get("LEMON_TPU_KNN_QCHUNK", default))


def use_pallas_knn() -> bool:
    """Pallas kNN kernels (fused score+blockmax, iterative top-k) are the
    TPU fast path; XLA remains the reference path and the only path off-TPU.
    Set LEMON_TPU_NO_PALLAS_KNN=1 to force XLA everywhere. Note the Pallas
    matmul's fp32 accumulation order differs from XLA's at the ~1e-6
    relative level (same inputs still produce identical scores for
    identical rows, so tie-breaking stays deterministic)."""
    if os.environ.get("LEMON_TPU_NO_PALLAS_KNN"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never fails in practice
        return False


# ---------------------------------------------------------------------------
# numpy oracle


def numpy_search(xb: np.ndarray, xq: np.ndarray, k: int, metric: str = "ip") -> Tuple[np.ndarray, np.ndarray]:
    """Exact reference search; ties broken by ascending database index."""
    if metric == "ip":
        scores = xq @ xb.T  # higher is better
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    elif metric == "l2":
        scores = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
        order = np.argsort(scores, axis=1, kind="stable")[:, :k]
    else:
        raise ValueError(metric)
    d = np.take_along_axis(scores, order, axis=1)
    return d.astype(np.float32), order.astype(np.int32)


# ---------------------------------------------------------------------------
# single-device jitted tiled search


def _matmul_precision(precision: str):
    return {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH}[precision]


def _scores_block(q: jnp.ndarray, db: jnp.ndarray, metric: str, db_sqnorm=None, precision: str = "highest") -> jnp.ndarray:
    """Similarity block (B, T); higher is always better internally.

    Full fp32 matmul precision by default: on TPU the default matmul path
    rounds fp32 inputs to bf16, which perturbs scores at the 1e-3 level —
    enough to reorder near-tied neighbors and break FAISS parity.
    ``precision='high'`` (bf16x3, opt-in) is 2.1x faster on the MXU with
    max score error 3.5e-6 on unit-norm embeddings (99.9% identical
    neighbor ids at k=51; only ulp-level near-ties reorder).
    """
    ip = jnp.dot(
        q, db.T, preferred_element_type=jnp.float32, precision=_matmul_precision(precision)
    )
    if metric == "ip":
        return ip
    # ||q-x||^2 = ||q||^2 - 2 q.x + ||x||^2 ; negate so 'higher is better'.
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    return -(q_sq - 2.0 * ip + db_sqnorm[None, :])


_BLOCK = 128  # lane width; blockmax prefilter granularity


def select_sub_width() -> int:
    """Second-level select granularity (env LEMON_TPU_KNN_SUBSEL; 0 = off).

    The final top-k runs over the k*128 gathered candidate columns — after
    the round-4 single-tile geometry this is the largest non-matmul stage
    (ops/topk.py iterative kernel: k VPU passes over the full width). A
    second blockmax level at ``sub``-lane granularity applies the
    prefilter argument recursively: the top-k elements of the candidate
    set lie in its top-k sub-groups by group max, so the final top-k
    width drops from k*128 to k*sub at the cost of one narrow group-max
    fold + one k-wide lax.top_k + one small gather. Exactness and the
    FAISS ascending-index tiebreak are preserved by keeping every level's
    selected ids sorted ascending (tests/test_knn.py sub-select cases;
    on-chip sub32 is bit-identical to sub0 at 128k db).

    MEASURED (round 4, v5e, probe_knn_subsel at q8192/tile 131072, k=51):
    the mode LOSES — exact 16.75 -> 13.59/12.53 B pairs/s (sub16/32),
    bf16x3 24.22 -> 20.44/17.32. The narrow-width saving in the iterative
    top-k is outweighed by the extra (B, k*128/sub, sub) take_along
    gather + the gmax lax.top_k, the same XLA-gather tax the round-2
    candidate-gather work hit. Default stays 0; the knob remains for
    other (k, tile) regimes and as the recorded negative result.
    """
    return int(os.environ.get("LEMON_TPU_KNN_SUBSEL", 0))


def _blockmax_select(sb: jnp.ndarray, bmax: jnp.ndarray, start, k: int, use_pallas: bool, gather: str = "take", n_valid: int | None = None, sub: int = 0):
    """Top-k of a masked score block given its precomputed block maxima.

    ``sb``: (B, n_blocks, 128) scores with invalid columns already masked
    (-inf on the XLA path, ops/scoremax.MASKED on the fused-Pallas path);
    ``bmax``: (B, n_blocks). Selection logic shared by the XLA path
    (_tile_topk, ``gather='take'``) and the fused-Pallas path
    (fused_scores_blockmax feeds this with ``gather='onehot'``).
    ``sub``: optional second-level granularity (see select_sub_width)."""
    b, n_blocks, _ = sb.shape
    # bmax top-k stays on lax.top_k: at the auto_tile widths (n_blocks
    # 512-1024) the Pallas iterative kernel's k sequential passes lose to
    # XLA's sort (A/B on-chip: 11.27 lax vs 11.04 B pairs/s pallas at
    # tile 64k, k=51) — the kernel only pays at the k*128 candidate width.
    _, block_ids = jax.lax.top_k(bmax, k)  # (B, k), first-occurrence ties
    # Sorting the k block ids (tiny) puts the gathered candidates in
    # ascending column order, so the final top-k's first-occurrence tie
    # rule equals the ascending-index tiebreak — no wide argsort needed.
    block_ids = jnp.sort(block_ids, axis=1)
    if gather == "onehot":
        # XLA's take_along_axis runs ~50x below HBM bandwidth here
        # (on-chip: 1.76 us/row inside the fused composition); a one-hot
        # HIGHEST matmul is bit-exact for 0/1 weights (each output is one
        # product 1.0*s plus exact zeros) and rides the MXU instead
        # (0.39 vs 0.85 us/row isolated). Requires the finite MASKED
        # sentinel: a 0-weight times -inf would inject NaN.
        onehot = (block_ids[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_blocks), 2)).astype(jnp.float32)
        cand = jax.lax.dot_general(
            onehot, sb, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
    else:
        cand = jnp.take_along_axis(sb, block_ids[:, :, None], axis=1)  # (B, k, 128)
    if sub and 0 < sub < _BLOCK and _BLOCK % sub == 0:
        # Second blockmax level: the top-k elements of the (b, k, 128)
        # candidate set lie in its top-k sub-lane groups by group max
        # (identical argument to the 128-lane prefilter, applied
        # recursively) — shrink the final top-k width from k*128 to
        # k*sub. block_ids are sorted ascending and groups enumerate in
        # ascending lane order, so sorting sub_ids keeps the flattened
        # candidates in ascending global-column order and lax.top_k's
        # first-occurrence rule still realizes the FAISS tiebreak.
        gpb = _BLOCK // sub  # groups per 128-block
        g = cand.reshape(b, k, gpb, sub)
        gmax = jnp.max(g, axis=3).reshape(b, k * gpb)
        _, sub_ids = jax.lax.top_k(gmax, k)  # (B, k), first-occurrence ties
        sub_ids = jnp.sort(sub_ids, axis=1)
        cand = jnp.take_along_axis(
            g.reshape(b, k * gpb, sub), sub_ids[:, :, None], axis=1
        ).reshape(b, k * sub)
        width = k * sub
    else:
        sub = 0
        cand = cand.reshape(b, k * _BLOCK)
        width = k * _BLOCK
    if use_pallas and _topk_supports(width, k):
        # interpret auto-selects: compiled on TPU, interpreter elsewhere
        # (lets CPU-mesh tests exercise this exact composition)
        out_s, pos = pallas_topk(cand, k)
    else:
        out_s, pos = jax.lax.top_k(cand, k)
        # restore the -inf padding contract when candidates carry the
        # finite sentinel (pallas_topk does this mapping itself)
        out_s = jnp.where(out_s == _MASKED, _NEG_INF, out_s)
    # Positions encode (block slot, [sub slot,] lane): recover global
    # columns from the per-level id vectors instead of materializing and
    # gathering a (B, width) column matrix (measured 0.50 -> ~0.02 us/row
    # at k=51 isolated).
    if sub:
        gpb = _BLOCK // sub
        flat_sub = jnp.take_along_axis(sub_ids, pos // sub, axis=1)  # in [0, k*gpb)
        slot_ids = jnp.take_along_axis(block_ids, flat_sub // gpb, axis=1)
        idx = start + slot_ids * _BLOCK + (flat_sub % gpb) * sub + pos % sub
    else:
        # Even the k-wide take_along pays the XLA gather tax in-context
        # (~0.3-0.5 us/row inside the fused select at k=51); a (B, k, k)
        # one-hot HIGHEST matmul against the id vector is bit-exact
        # (block ids < 2^24 are exact in fp32; each output is one product
        # 1.0*id plus exact zeros) and rides the MXU. Measured on the full
        # select composition: 3.10 -> 2.56 us/row same-session
        # (benchmarks/probe_knn_select3.py --f, v5e, 128k db, k=51).
        oh = ((pos // _BLOCK)[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)).astype(jnp.float32)
        slot_ids = jax.lax.dot_general(
            oh, block_ids.astype(jnp.float32)[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )[:, :, 0].astype(jnp.int32)
        idx = start + slot_ids * _BLOCK + pos % _BLOCK
    if n_valid is not None:
        # Padding slots (-inf) otherwise carry whatever masked column they
        # came from — with 8-block alignment padding that can exceed even
        # the padded database length. Pin them to exactly n_valid (the
        # _tile_topk small-tile convention): still out-of-range per the
        # contract, but bounded and deterministic.
        idx = jnp.where(jnp.isneginf(out_s), n_valid, idx)
    return out_s, idx


def _tile_topk(s: jnp.ndarray, start: int | jnp.ndarray, k: int, n_valid: int, use_pallas: bool = False, sub: int = 0):
    """Exact per-tile top-k of a (B, T) score block via blockmax prefilter.

    The top-k elements of a row lie in at most k of its 128-wide blocks,
    and every such block's max is >= the k-th best value — so selecting the
    top-k blocks by block-max (first-occurrence ties, consistent with
    ascending-index element ties) provably retains all top-k elements.
    This turns one TopK over T columns into a TopK over T/128 block maxes
    plus a TopK over k*128 gathered candidates — the wide-TopK cost that
    dominates exact search on TPU drops by ~T/(k*128).
    """
    b, t = s.shape
    col = start + jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    # The prefilter only pays when it prunes substantially (the gathered
    # candidate set is k*128 wide); below ~4x pruning the plain wide TopK
    # is faster.
    if t < 4 * k * _BLOCK or t % _BLOCK != 0:
        kk = min(k, t)
        out_s, pos = jax.lax.top_k(s, kk)
        out_i = jnp.take_along_axis(col, pos, axis=1)
        if kk < k:  # tiny tile: pad to k with sentinels
            pad_s = jnp.full((b, k - kk), _NEG_INF, s.dtype)
            pad_i = jnp.full((b, k - kk), n_valid, jnp.int32)
            out_s = jnp.concatenate([out_s, pad_s], axis=1)
            out_i = jnp.concatenate([out_i, pad_i], axis=1)
        return out_s, out_i
    n_blocks = t // _BLOCK
    sb = s.reshape(b, n_blocks, _BLOCK)
    bmax = jnp.max(sb, axis=2)
    return _blockmax_select(sb, bmax, start, k, use_pallas, n_valid=n_valid, sub=sub)


def auto_tile(n_db: int, n_queries: int, budget_bytes: int = 4 << 30) -> int:
    """Largest DB tile whose (B, tile) fp32 score block fits the budget.

    Bigger tiles mean fewer wide-TopK merges — measured 4.4 -> 7.1 B
    pairs/s going from 32k to 64k tiles at k=51 (BENCH_NOTES.md); the
    whole-DB tile OOMs once B * N * 4 bytes passes HBM, hence the budget.
    """
    max_tile = max(budget_bytes // max(4 * n_queries, 1), _BLOCK)
    n_tiles = max(1, -(-n_db // max_tile))
    tile = -(-(-(-n_db // n_tiles)) // _BLOCK) * _BLOCK
    # Round to 8-block (1024-column) multiples when the tile is large
    # enough: Mosaic's sublane rule makes the fused kernel pad odd widths
    # per tile anyway (ops/scoremax.py:plan_tile_cols) — aligning here
    # keeps the j-sweep uniform with no padding work.
    if tile > 8 * _BLOCK:
        tile = -(-tile // (8 * _BLOCK)) * (8 * _BLOCK)
    return tile


def _tiled_search_impl(xq, xb, *, k: int, metric: str, tile: int, n_valid, use_pallas: bool = False, precision: str = "highest", sub: int = 0):
    """Scan DB tiles carrying a running (score, index) top-k per query row.

    ``xb`` may have any length; it is padded to a tile multiple inside the
    program (padding rows are masked by ``n_valid`` — a Python int through
    the jitted :func:`_tiled_search` wrapper, where it stays a compile-time
    constant the Pallas kernel folds, or a traced int32 scalar on the
    sharded path, which passes each shard's own valid count so padding
    rows can never evict real candidates from the per-shard top-k). With ``use_pallas``
    (TPU fast path) the per-tile score matmul + mask + blockmax run as one
    fused Pallas kernel and the final candidate select as the iterative
    Pallas top-k (ops/scoremax.py, ops/topk.py)."""
    pad = (-xb.shape[0]) % tile
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
    n = xb.shape[0]
    n_tiles = n // tile
    db_sqnorm = jnp.sum(xb * xb, axis=1) if metric == "l2" else None
    # The fused kernel only pays on prefilter-eligible tiles (same branch
    # condition as _tile_topk); elsewhere the XLA path runs.
    fuse = use_pallas and tile % _BLOCK == 0 and tile >= 4 * k * _BLOCK

    def tile_results(db, dbsq, start):
        if fuse:
            s, bmax = fused_scores_blockmax(
                xq, db, metric, dbsq, start=start, n_valid=n_valid,
                precision=precision,
            )
            # s is already block-major (B, db/128, 128) — the kernel emits
            # the gather-native layout (a post-hoc reshape retiles, ~1
            # us/row).
            # onehot gather rides the MXU: a win when the score matmul is
            # bf16x3 (half the MXU passes leave headroom; on-chip 13.2 ->
            # 14.6 B pairs/s) but a loss under fp32-HIGHEST where the MXU
            # is already the bottleneck (11.0 -> 8.4); gate by precision.
            gather = "onehot" if precision == "high" else "take"
            return _blockmax_select(s, bmax, start, k, use_pallas, gather=gather, n_valid=n_valid, sub=sub)
        s = _scores_block(xq, db, metric, dbsq, precision)
        return _tile_topk(s, start, k, n_valid, use_pallas, sub=sub)

    if n_tiles == 1:
        # Single tile: no merge needed — measured +45% at (16k queries,
        # 64k db, k=51) over the scan path (BENCH_NOTES round 2).
        return tile_results(xb, db_sqnorm, 0)

    def step(_, t):
        start = t * tile
        db = jax.lax.dynamic_slice_in_dim(xb, start, tile, 0)
        dbsq = None if db_sqnorm is None else jax.lax.dynamic_slice_in_dim(db_sqnorm, start, tile, 0)
        return None, tile_results(db, dbsq, start)

    # Collect every tile's top-k, then ONE wide merge instead of a
    # (k + k)-wide top_k per tile: tile-major candidate order is ascending
    # database index, and within a tile _tile_topk already breaks ties by
    # ascending index, so lax.top_k's first-occurrence rule preserves the
    # FAISS tiebreak.
    _, (all_s, all_i) = jax.lax.scan(step, None, jnp.arange(n_tiles))
    b = xq.shape[0]
    cat_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_tiles * k)
    cat_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_tiles * k)
    scores, pos = jax.lax.top_k(cat_s, k)
    idx = jnp.take_along_axis(cat_i, pos, axis=1)
    return scores, idx


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile", "n_valid", "use_pallas", "precision", "sub"))
def _tiled_search(xq, xb, *, k: int, metric: str, tile: int, n_valid: int, use_pallas: bool = False, precision: str = "highest", sub: int = 0):
    """Jitted single-device entry: ``n_valid`` is static (a Python int) so
    the fused kernel's validity mask folds at compile time. The sharded
    path calls :func:`_tiled_search_impl` directly with a traced per-shard
    count."""
    return _tiled_search_impl(
        xq, xb, k=k, metric=metric, tile=tile, n_valid=n_valid,
        use_pallas=use_pallas, precision=precision, sub=sub,
    )


# ---------------------------------------------------------------------------
# mesh-sharded search


def _sharded_search_fn(mesh: Mesh, k: int, metric: str, tile: int, use_pallas: bool = False, precision: str = "highest", sub: int = 0):
    """Build a shard_map'd search over a database sharded on DATA_AXIS."""
    from jax import shard_map

    n_dev = mesh.shape[DATA_AXIS]

    def local_search(xq, xb_shard, shard_starts, shard_valid):
        # xq replicated; xb_shard: this device's rows. Indices are globalized
        # with the shard's row offset before merging.
        my = jax.lax.axis_index(DATA_AXIS)
        # n_valid must be THIS shard's valid-row count, not the padded
        # shard size: zero-padding rows score 0 ('ip') / -||q||^2 ('l2')
        # and would otherwise compete inside the per-shard top-k, evicting
        # genuine low-similarity neighbors before the post-hoc mask below
        # can drop them (FAISS would return those rows).
        s, i = _tiled_search_impl(
            xq, xb_shard, k=k, metric=metric, tile=tile,
            n_valid=shard_valid[my], use_pallas=use_pallas, precision=precision,
            sub=sub,
        )
        valid = i < shard_valid[my]
        s = jnp.where(valid, s, _NEG_INF)
        i = jnp.where(valid, i + shard_starts[my], jnp.int32(2**30))
        # Gather every shard's candidates (tiny: n_dev * B * k) and merge.
        all_s = jax.lax.all_gather(s, DATA_AXIS, axis=0)  # (n_dev, B, k)
        all_i = jax.lax.all_gather(i, DATA_AXIS, axis=0)
        cat_s = jnp.moveaxis(all_s, 0, 1).reshape(xq.shape[0], n_dev * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(xq.shape[0], n_dev * k)
        # Sort within ties by index: top_k keeps first occurrence; order the
        # concat by (shard, slot) which is ascending index within each shard
        # but interleaved across shards — resolve exactly via lexicographic
        # penalty-free two-key sort below.
        order = jnp.argsort(cat_i, axis=1, stable=True)
        cat_s = jnp.take_along_axis(cat_s, order, axis=1)
        cat_i = jnp.take_along_axis(cat_i, order, axis=1)
        out_s, pos = jax.lax.top_k(cat_s, k)
        out_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return out_s, out_i

    return shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


class ExactKnnIndex:
    """Exact kNN index over an embedding matrix.

    >>> index = ExactKnnIndex(metric='ip')
    >>> index.add(embeddings)           # (N, D), L2-normalized for cosine
    >>> scores, ids = index.search(q, k=5)

    ``mesh=None`` runs single-device; with a mesh the database is sharded
    across devices on the data axis.
    """

    def __init__(self, metric: str = "ip", tile: Optional[int] = None, mesh: Optional[Mesh] = None, backend: str = "device", precision: str = "highest", select_sub: Optional[int] = None):
        """``tile=None`` picks the largest DB tile whose score block fits a
        4GB budget per search (bigger tiles = fewer wide-TopK merges).
        ``precision='high'`` opts into the bf16x3 score matmul (2.1x MXU
        throughput, ~1e-6 score error; see _scores_block) — the default
        stays full-fp32 for FAISS parity. ``select_sub=None`` reads the
        LEMON_TPU_KNN_SUBSEL env default (see select_sub_width; exact at
        any setting)."""
        assert metric in ("ip", "l2")
        assert backend in ("device", "cpp")
        assert precision in ("highest", "high")
        self.metric = metric
        self.tile = tile
        self.mesh = mesh
        self.backend = backend
        self.precision = precision
        self.select_sub = select_sub_width() if select_sub is None else select_sub
        self._chunks = []
        self._xb = None  # device array, padded
        self._xb_host = None
        self._n = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def add(self, xb) -> None:
        """Host arrays are uploaded at finalize; an already device-resident
        float32 array (single-device 'device' backend only) is adopted
        as-is, skipping the upload — detect.py's warm path feeds cached
        device embeddings here, saving ~0.5 s per 32 MB through the
        tunnel (BENCH_NOTES round 5)."""
        if (
            isinstance(xb, jax.Array)
            and not isinstance(xb, np.ndarray)
            and self.backend == "device"
            and self.mesh is None
        ):
            assert not self._chunks and self._xb is None, "mixing device and host adds is unsupported"
            self._xb = xb if xb.dtype == jnp.float32 else xb.astype(jnp.float32)
            self._xb_host = None
            self._n = int(xb.shape[0])
            return
        assert self._xb is None or self._chunks, "cannot append host chunks to a device-adopted index"
        self._chunks.append(np.ascontiguousarray(xb, dtype=np.float32))
        self._xb = None
        self._xb_host = None

    def _finalize(self):
        if self._xb is not None or self._xb_host is not None:
            return
        xb = np.concatenate(self._chunks, axis=0) if len(self._chunks) > 1 else self._chunks[0]
        self._n = xb.shape[0]
        if self.backend == "cpp":
            # Native host backend (lemon_tpu.knn.cpp_backend): embeddings
            # stay in host memory; no padding needed.
            self._xb_host = xb
            return
        if self.mesh is None:
            # _tiled_search pads to the (per-search, adaptive) tile itself.
            self._xb = jnp.asarray(xb)
        else:
            n_dev = self.mesh.shape[DATA_AXIS]
            per = pad_to_multiple(pad_to_multiple(self._n, n_dev) // n_dev, _BLOCK)
            n_pad = per * n_dev
            if n_pad != self._n:
                xb = np.pad(xb, [(0, n_pad - self._n), (0, 0)])
            self._xb = jax.device_put(
                xb, NamedSharding(self.mesh, P(DATA_AXIS, None))
            )
            # Per-shard global row offsets and valid counts.
            starts = np.arange(n_dev, dtype=np.int32) * per
            valid = np.clip(self._n - starts, 0, per).astype(np.int32)
            self._shard_starts = jnp.asarray(starts)
            self._shard_valid = jnp.asarray(valid)
            self._search_fns = {}

    def device_array(self):
        """The index's device-resident database (single-device 'device'
        backend only): callers that need the same embeddings for other
        device work (e.g. detect.py's neighbor-component program) reuse
        this array instead of paying a second host->device upload of the
        identical matrix — on the tunneled TPU that upload is ~0.5 s per
        32 MB (BENCH_NOTES round 4, warm-e2e decomposition)."""
        assert self.backend == "device" and self.mesh is None
        self._finalize()
        return self._xb

    def search(self, xq: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores, indices), both (B, k).

        'ip': inner products descending. 'l2': squared distances ascending.
        """
        self._finalize()
        if self.backend == "cpp":
            from lemon_tpu.knn import cpp_backend

            return cpp_backend.search(self._xb_host, np.asarray(xq), k, self.metric)
        if not isinstance(xq, jax.Array):
            xq = np.ascontiguousarray(xq, dtype=np.float32)
        else:
            # Device-resident queries ride as-is (callers that already hold
            # the matrix on the device — e.g. detect.py shares one upload
            # between search and the components program — must not pay a
            # device->host->device round trip here).
            assert xq.dtype == jnp.float32, xq.dtype
        if self.mesh is None:
            # Chunk queries so the adaptive tile stays large (the tile, not
            # the query batch, drives select/merge cost); chunks dispatch
            # async. See search_q_chunk for the tradeoff.
            q_chunk = search_q_chunk()
            tile = self.tile or auto_tile(self._n, min(len(xq), q_chunk))
            tile = min(tile, pad_to_multiple(self._n, _BLOCK))
            pallas = use_pallas_knn()
            parts = [
                _tiled_search(
                    jnp.asarray(xq[start : start + q_chunk]), self._xb,
                    k=k, metric=self.metric, tile=tile, n_valid=self._n,
                    use_pallas=pallas, precision=self.precision,
                    sub=self.select_sub,
                )
                for start in range(0, len(xq), q_chunk)
            ]
            if len(parts) == 1:
                s, i = parts[0]
            else:
                s = jnp.concatenate([p[0] for p in parts])
                i = jnp.concatenate([p[1] for p in parts])
        else:
            per_shard = self._xb.shape[0] // self.mesh.shape[DATA_AXIS]
            tile = min(self.tile or auto_tile(per_shard, xq.shape[0]), per_shard)
            pallas = use_pallas_knn()
            key = (k, tile, pallas, self.precision, self.select_sub)
            if key not in self._search_fns:
                self._search_fns[key] = _sharded_search_fn(self.mesh, k, self.metric, tile, pallas, self.precision, self.select_sub)
            s, i = self._search_fns[key](xq, self._xb, self._shard_starts, self._shard_valid)
        s = np.asarray(s)
        i = np.asarray(i, dtype=np.int32)
        if self.metric == "l2":
            s = -s  # internal 'higher is better' -> squared distances
        return s, i


def train_split_exclusion(scores: np.ndarray, idx: np.ndarray, sample_ids: np.ndarray, in_comparison: np.ndarray):
    """Apply the reference's train-split self-exclusion rule.

    Queries from the train split search with k+1 neighbors; if the sample is
    a member of the comparison set its first hit is assumed to be itself and
    dropped, otherwise the last hit is dropped (run_lemon.py:257-263).

    ``in_comparison``: boolean per query row. Returns (B, k) arrays.
    """
    member = in_comparison[:, None]
    k = idx.shape[1] - 1
    first_dropped_s = scores[:, 1:]
    last_dropped_s = scores[:, :k]
    first_dropped_i = idx[:, 1:]
    last_dropped_i = idx[:, :k]
    out_s = np.where(member, first_dropped_s, last_dropped_s)
    out_i = np.where(member, first_dropped_i, last_dropped_i)
    return out_s, out_i
