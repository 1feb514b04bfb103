"""int8 vs bf16 matmul probe on the real TPU (round-2 verdict #1).

The round-2 int8 dismissal rested on one XLA ``dot_general`` measurement
(194 TOPS int8 vs 278 TFLOPS bf16 — BENCH_NOTES.md:55-65). Two earlier
drafts of this probe produced garbage (3600 "TFLOPS", negative two-point
deltas): summing one output element lets XLA slice the matmul away, and an
input perturbation that doesn't depend on the previous step's OUTPUT lets
the compiler overlap/hoist iterations. The fix: a serial chain — every
step's input is the previous step's output (requantized int8 / rescaled
bf16), one scalar fetched at the end, so s steps cost s dependent matmuls
and nothing is sliceable or hoistable.

Shapes: the ViT-B MLP pair (768->3072->768, chained) and the attention
projections (768->2304 reshaped ->768, chained), M = the embed pipeline's
token count, plus 4096^3. Pallas twins at 4096^3 sanity-check whether a
hand kernel beats XLA's int8 lowering (it does not).

Run: python benchmarks/probe_pallas_int8.py   (one TPU process at a time!)
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
from benchmarks._timing import timed_scalar  # noqa: E402

BM, BN, BK = 512, 512, 2048


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, acc_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_matmul(a, b, acc_dtype, out_dtype):
    m, k = a.shape
    _, n = b.shape
    kernel = functools.partial(_mm_kernel, acc_dtype=acc_dtype)
    return pl.pallas_call(
        kernel,
        grid=(m // BM, n // BN, k // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, s: (i, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, s: (s, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, s: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=m * k + k * n + m * n, transcendentals=0
        ),
    )(a, b)


def chain_rate(step_fn, x0, flops_per_step, label, small=8, large=40):
    """seconds/step of a serially-dependent x -> step_fn(x) chain."""

    @functools.partial(jax.jit, static_argnames=("s",))
    def run(x, s):
        def body(x, _):
            return step_fn(x), ()

        xf, _ = jax.lax.scan(body, x, None, length=s)
        return jnp.sum(xf[0, :8].astype(jnp.float32))

    t = lambda s: timed_scalar(run, x0, s)
    run(x0, small); run(x0, large)  # compile
    t_small = min(t(small) for _ in range(3))
    t_large = min(t(large) for _ in range(3))
    per_step = (t_large - t_small) / (large - small)
    tflops = flops_per_step / per_step / 1e12
    print(f"{label:44s} {per_step*1e3:8.3f} ms/step  {tflops:7.1f} T(FL)OPS", flush=True)
    return tflops


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    results = {}

    def int8_requant(y32):
        # real quantized-layer epilogue: rescale int32 accum back to int8
        return jnp.clip(y32 >> 8, -127, 127).astype(jnp.int8)

    # --- square 4096^3: XLA vs Pallas, both dtypes --------------------
    m = k = n = 4096
    x8 = jnp.asarray(rng.integers(-64, 64, (m, k)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-64, 64, (k, n)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(k, n)) * (k ** -0.5), jnp.bfloat16)
    fl = 2 * m * k * n
    results["xla_bf16_4096"] = chain_rate(
        lambda x: jnp.dot(x, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        xb, fl, "XLA bf16 4096^3 (chained)")
    results["xla_int8_4096"] = chain_rate(
        lambda x: int8_requant(jnp.dot(x, w8, preferred_element_type=jnp.int32)),
        x8, fl, "XLA int8 4096^3 (chained, requant)")
    results["pallas_bf16_4096"] = chain_rate(
        lambda x: pallas_matmul(x, wb, jnp.float32, jnp.bfloat16),
        xb, fl, "Pallas bf16 4096^3 (chained)")
    results["pallas_int8_4096"] = chain_rate(
        lambda x: int8_requant(pallas_matmul(x, w8, jnp.int32, jnp.int32)),
        x8, fl, "Pallas int8 4096^3 (chained, requant)")

    # --- ViT-B MLP pair: x(12800,768) -> 3072 -> 768 ------------------
    m, d, h = 12800, 768, 3072
    x8 = jnp.asarray(rng.integers(-64, 64, (m, d)), jnp.int8)
    w1_8 = jnp.asarray(rng.integers(-64, 64, (d, h)), jnp.int8)
    w2_8 = jnp.asarray(rng.integers(-64, 64, (h, d)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(m, d)), jnp.bfloat16)
    w1b = jnp.asarray(rng.normal(size=(d, h)) * (d ** -0.5), jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(h, d)) * (h ** -0.5), jnp.bfloat16)
    fl = 2 * m * d * h * 2
    results["xla_bf16_mlp"] = chain_rate(
        lambda x: jnp.dot(jnp.dot(x, w1b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
                          w2b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        xb, fl, "XLA bf16 MLP pair 768->3072->768")
    results["xla_int8_mlp"] = chain_rate(
        lambda x: int8_requant(jnp.dot(int8_requant(jnp.dot(x, w1_8, preferred_element_type=jnp.int32)),
                                       w2_8, preferred_element_type=jnp.int32)),
        x8, fl, "XLA int8 MLP pair (requant between)")
    # mixed precision as the production path would run it: int8 matmul,
    # fp32 dequant + GELU in bf16, requantize activations on the fly
    scale1 = jnp.float32(2e-6)
    results["xla_int8_gelu_mlp"] = chain_rate(
        lambda x: int8_requant(jnp.dot(
            jnp.clip(jax.nn.gelu(jnp.dot(x, w1_8, preferred_element_type=jnp.int32) * scale1) * 127, -127, 127).astype(jnp.int8),
            w2_8, preferred_element_type=jnp.int32)),
        x8, fl, "XLA int8 MLP pair + fp GELU/requant")

    # --- attention projections: 768 -> 2304 (reshape 3x768) -> 768 ----
    m, d = 6400, 768
    x8 = jnp.asarray(rng.integers(-64, 64, (m, d)), jnp.int8)
    wq8 = jnp.asarray(rng.integers(-64, 64, (d, 3 * d)), jnp.int8)
    wo8 = jnp.asarray(rng.integers(-64, 64, (d, d)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(m, d)), jnp.bfloat16)
    wqb = jnp.asarray(rng.normal(size=(d, 3 * d)) * (d ** -0.5), jnp.bfloat16)
    wob = jnp.asarray(rng.normal(size=(d, d)) * (d ** -0.5), jnp.bfloat16)
    fl = 2 * m * d * 3 * d + 2 * 3 * m * d * d

    def proj_pair_bf16(x):
        q = jnp.dot(x, wqb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        q = q.reshape(3 * x.shape[0], x.shape[1])  # reshape, not slice: un-sliceable
        o = jnp.dot(q, wob, preferred_element_type=jnp.float32)
        return jnp.mean(o.reshape(3, x.shape[0], x.shape[1]), 0).astype(jnp.bfloat16)

    def proj_pair_int8(x):
        q = int8_requant(jnp.dot(x, wq8, preferred_element_type=jnp.int32))
        q = q.reshape(3 * x.shape[0], x.shape[1])
        o = jnp.dot(q, wo8, preferred_element_type=jnp.int32)
        return int8_requant(jnp.sum(o.reshape(3, x.shape[0], x.shape[1]), 0) >> 2)

    results["xla_bf16_proj"] = chain_rate(proj_pair_bf16, xb, fl, "XLA bf16 qkv+out projections")
    results["xla_int8_proj"] = chain_rate(proj_pair_int8, x8, fl, "XLA int8 qkv+out projections")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
