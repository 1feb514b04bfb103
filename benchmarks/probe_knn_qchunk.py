"""kNN (query-chunk x database-tile) geometry sweep (round 4).

The round-3 verdict + corrected advisor math put the exact-kNN bottleneck
in the NON-matmul stages: at the production geometry (q_chunk 16384,
tile 65536, db 128k) the select stage (block-topk, candidate gather,
iterative top-k) and the cross-tile merge run once per TILE, i.e. twice
per row at 128k — ~70% of pipeline time vs ~30% for the score matmul.

At a fixed score-block budget (auto_tile: 4 GB), tile size and query
chunk trade off: tile = budget / (4 * q_chunk). Select cost per row
scales with n_tiles = N / tile = 4 * q_chunk * N / budget — LINEAR in
q_chunk — while the matmul stays MXU-bound for any B >= ~2k. So a
smaller query chunk should be nearly free speed. This probe sweeps the
geometry at the bench shape (db 131072, d 512, k 51) for both score
precisions, including the 8 GB (16384 x 131072) block that tests
whether the budget itself should rise.

Each config times _tiled_search exactly as bench.py does (scalar-forced,
two-point over q_small=1024 vs q_chunk rows).

Run: python benchmarks/probe_knn_qchunk.py   (one TPU process at a time)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks._timing import two_point  # noqa: E402

from lemon_tpu.knn.index import _tiled_search, use_pallas_knn  # noqa: E402

N_DB, D, K, Q_SMALL = 131_072, 512, 51, 1024

# (q_chunk, tile): production round-3 geometry first, then the
# single-tile candidates, a tile-only control, and the 8 GB block.
CONFIGS = [
    (16384, 65536),   # round-3 production: 2 tiles, select runs twice/row
    (8192, 131072),   # single tile, half the matmul batch
    (4096, 131072),   # single tile, quarter batch
    (8192, 65536),    # control: same q as candidate, old tile
    (16384, 131072),  # 8 GB score block: is the 4 GB budget conservative?
]


def main():
    print("backend:", jax.default_backend(), flush=True)
    pallas = use_pallas_knn()
    rng = np.random.default_rng(1)
    xb_h = rng.standard_normal((N_DB, D)).astype(np.float32)
    xb_h /= np.linalg.norm(xb_h, axis=1, keepdims=True)
    xq_h = rng.standard_normal((max(q for q, _ in CONFIGS), D)).astype(np.float32)
    xq_h /= np.linalg.norm(xq_h, axis=1, keepdims=True)
    xb = jnp.asarray(xb_h)
    q_small = jnp.asarray(xq_h[:Q_SMALL])

    results = {}
    for precision in ("highest", "high"):
        for q_chunk, tile in CONFIGS:
            tag = f"{precision}_q{q_chunk}_t{tile}"

            def run(xq_dev, xb_arg, tile=tile, precision=precision):
                s, i = _tiled_search(
                    xq_dev, xb_arg, k=K, metric="ip", tile=tile,
                    n_valid=N_DB, use_pallas=pallas, precision=precision,
                )
                return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

            q_large = jnp.asarray(xq_h[:q_chunk])
            try:
                dt = two_point(run, (q_small, xb), (q_large, xb))
            except Exception as e:  # 8 GB block may OOM — record and move on
                print(f"{tag:28s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
                results[tag] = None
                continue
            rate = N_DB * (q_chunk - Q_SMALL) / dt
            results[tag] = rate
            print(f"{tag:28s}: {rate/1e9:7.2f} B pairs/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
