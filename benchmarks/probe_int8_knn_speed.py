"""int8 kNN score-matmul sizing probe (round 3).

Companion to probe_int8_knn_accuracy.py, which measured that per-vector
int8 quantization of unit-norm 512-d embeddings keeps only ~98% of the
k=51 neighbor set. Its decision rule: before ANY kernel work, size the
speed win with an XLA-level probe at the kNN shapes. This probe times
the SCORE MATMUL STAGE alone (the only stage a dtype change touches) at
the production tile (B=16384 queries x T=65536 db rows x D=512) under:

- fp32 HIGHEST  (shipped exact mode's matmul)
- bf16x3 HIGH   (shipped opt-in fast mode's matmul)
- pure bf16     (hypothetical, looser than bf16x3)
- int8 end-to-end as the pipeline would run it: pre-quantized int8 db,
  per-batch on-the-fly query quantization, int32 dot, and the
  per-row x per-column scale multiply that makes scores comparable
  across db columns (required for a correct top-k; fuses into the
  consumer but is real work at (B, T) size)
- int8 matmul alone (quantize + rescale excluded — the kernel ceiling)

Each leg returns a scalar (sum of row maxes) so the relay actually
executes; two-point marginal timing cancels dispatch/fetch constants.

Context for interpretation (BENCH_NOTES "int8 kNN scoring"): the score
matmul is ~1.0 us/row of a ~7.3 us/row bf16x3 pipeline total at 128k db,
so headline movement is bounded by ~14% even if the matmul were free.

Run: python benchmarks/probe_int8_knn_speed.py  (one TPU process at a time)
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

B_SMALL, B, T, D = 1024, 16384, 65536, 512


def two_point_rate(fn, small_args, large_args):
    per_query = two_point(jax.jit(fn), small_args, large_args) / (B - B_SMALL)
    return T / per_query  # pairs/s


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    xb_h = rng.standard_normal((T, D)).astype(np.float32)
    xb_h /= np.linalg.norm(xb_h, axis=1, keepdims=True)
    xq_h = rng.standard_normal((B, D)).astype(np.float32)
    xq_h /= np.linalg.norm(xq_h, axis=1, keepdims=True)

    xb = jnp.asarray(xb_h)
    q_small, q_large = jnp.asarray(xq_h[:B_SMALL]), jnp.asarray(xq_h)

    results = {}

    def fp_leg(precision):
        def fn(q, db):
            s = jnp.dot(q, db.T, preferred_element_type=jnp.float32, precision=precision)
            return jnp.sum(jnp.max(s, axis=1))
        return fn

    for tag, prec in (
        ("fp32_highest", jax.lax.Precision.HIGHEST),
        ("bf16x3_high", jax.lax.Precision.HIGH),
    ):
        results[tag] = two_point_rate(fp_leg(prec), (q_small, xb), (q_large, xb))
        print(f"{tag:22s}: {results[tag]/1e9:7.2f} B pairs/s", flush=True)

    def bf16_fn(q, db):
        s = jnp.dot(q.astype(jnp.bfloat16), db.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return jnp.sum(jnp.max(s, axis=1))

    results["bf16"] = two_point_rate(bf16_fn, (q_small, xb), (q_large, xb))
    print(f"{'bf16':22s}: {results['bf16']/1e9:7.2f} B pairs/s", flush=True)

    # per-vector symmetric int8 db, quantized once on device (as the index
    # build would); queries quantized per batch inside the timed program
    def quant(v):
        # epsilon floor: an all-zero row would otherwise divide 0/0 -> NaN
        # (unreachable with this probe's Gaussian data, but this helper is
        # the pattern an index build would lift)
        scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12) / 127.0
        return jnp.round(v / scale).astype(jnp.int8), scale.astype(jnp.float32)

    xb_i8, xb_scale = jax.jit(quant)(xb)
    xb_i8t = jax.block_until_ready(jnp.asarray(xb_i8).T)  # (D, T) layout like db.T
    xb_scale_row = jax.block_until_ready(xb_scale.reshape(1, T))

    def int8_pipeline_fn(q, dbt, db_scale_row):
        qi, qs = quant(q)
        s32 = jnp.dot(qi, dbt, preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs * db_scale_row  # cross-column comparable
        return jnp.sum(jnp.max(s, axis=1))

    results["int8_pipeline"] = two_point_rate(
        int8_pipeline_fn, (q_small, xb_i8t, xb_scale_row), (q_large, xb_i8t, xb_scale_row))
    print(f"{'int8_pipeline':22s}: {results['int8_pipeline']/1e9:7.2f} B pairs/s", flush=True)

    q_small_i8 = jax.block_until_ready(jax.jit(quant)(q_small)[0])
    q_large_i8 = jax.block_until_ready(jax.jit(quant)(q_large)[0])

    def int8_matmul_fn(qi, dbt):
        s32 = jnp.dot(qi, dbt, preferred_element_type=jnp.int32)
        return jnp.sum(jnp.max(s32, axis=1)).astype(jnp.float32)

    results["int8_matmul_only"] = two_point_rate(
        int8_matmul_fn, (q_small_i8, xb_i8t), (q_large_i8, xb_i8t))
    print(f"{'int8_matmul_only':22s}: {results['int8_matmul_only']/1e9:7.2f} B pairs/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
