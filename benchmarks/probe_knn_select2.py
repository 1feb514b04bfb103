"""Isolate the ~1.0 us/row of select-internal cost the stage decomposition
(probe_knn_decomp) couldn't attribute: select (2.65) vs bmax_topk + gather
+ final_topk (1.65) at bf16x3, q8192 x 131072, k=51.

Suspects, timed individually with identical inputs:

- gt            : gather -> reshape -> pallas_topk as ONE jitted program
                  (pre-sorted ids given). If this ~2.4, the cost is the
                  gather->topk seam (cand materialization / reshape /
                  onehot materialization); if ~1.5, it's the id/index
                  bookkeeping around them.
- onehot_only   : build + materialize the (B, k, n_blocks) one-hot.
- reshape_only  : (B, k, 128) -> (B, k*128) physical retile.
- recon_only    : the slot_ids/idx reconstruction k-wide gathers.

Run: python benchmarks/probe_knn_select2.py   (one TPU process at a time)
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

from lemon_tpu.ops.scoremax import fused_scores_blockmax  # noqa: E402
from lemon_tpu.ops.topk import pallas_topk  # noqa: E402

N_DB, D, K = 131_072, 512, 51
Q_SMALL, Q_LARGE = 1024, 8192
LANES = 128


def onehot_dot(sb, ids):
    n_blocks = sb.shape[1]
    onehot = (
        ids[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_blocks), 2)
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, sb, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )


@jax.jit
def stage_gt(sb, ids):
    cand = onehot_dot(sb, ids).reshape(sb.shape[0], K * LANES)
    out_s, pos = pallas_topk(cand, K)
    return jnp.sum(out_s) + jnp.sum(pos).astype(jnp.float32)


@jax.jit
def stage_onehot_only(ids, n_blocks_arr):
    n_blocks = n_blocks_arr.shape[0]
    onehot = (
        ids[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_blocks), 2)
    ).astype(jnp.float32)
    return jnp.sum(onehot)


@jax.jit
def stage_reshape_only(cand3):
    flat = cand3.reshape(cand3.shape[0], K * LANES)
    # touch in the flat layout so the retile must happen
    return jnp.sum(flat[:, ::7])


@jax.jit
def stage_recon_only(ids, pos):
    slot_ids = jnp.take_along_axis(ids, pos // LANES, axis=1)
    idx = slot_ids * LANES + pos % LANES
    return jnp.sum(idx).astype(jnp.float32)


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
        _, ids = jax.lax.top_k(bmax, K)
        ids = jnp.sort(ids, axis=1)
        cand3 = onehot_dot(sb, ids)
        _, pos = pallas_topk(cand3.reshape(q.shape[0], K * LANES), K)
        staged[tag] = dict(
            sb=jax.block_until_ready(sb), ids=jax.block_until_ready(ids),
            cand3=jax.block_until_ready(cand3), pos=jax.block_until_ready(pos),
        )

    rows = Q_LARGE - Q_SMALL
    results = {}

    def record(name, dt):
        us = dt / rows * 1e6
        results[f"{name}_us_row"] = round(us, 3)
        print(f"{name:14s}: {us:6.3f} us/row", flush=True)

    record("gt", two_point(stage_gt, (staged["s"]["sb"], staged["s"]["ids"]),
                           (staged["l"]["sb"], staged["l"]["ids"])))
    nb = jnp.zeros((staged["l"]["sb"].shape[1],))
    record("onehot_only", two_point(stage_onehot_only, (staged["s"]["ids"], nb),
                                    (staged["l"]["ids"], nb)))
    record("reshape_only", two_point(stage_reshape_only, (staged["s"]["cand3"],),
                                     (staged["l"]["cand3"],)))
    record("recon_only", two_point(stage_recon_only, (staged["s"]["ids"], staged["s"]["pos"]),
                                   (staged["l"]["ids"], staged["l"]["pos"])))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
