"""int8 attention core: direct feasibility measurement (round 5, item 3).

After the round-4 decomposition the unquantized attention core (bf16
softmax + two hd=64 batched matmuls) is ~2.21 ms = ~36% of the int8_static
12-block stack. The round-3 fused-core PALLAS emulation lost 3.6x, but an
XLA-native int8 core was never measured. This probe times, on fixed
(q, k, v) in the shipped packed geometry (R=64, LP=100, H=12, HD=64):

  core_bf16    - the shipped core (bf16 softmax, bf16 matmuls)
  core_int8    - QK^T and AV as int8 dots: per-(row,head) dynamic max-abs
                 quantize of Q and K, logits dequantized to bf16 for the
                 softmax, probs quantized at a static 1/127 scale (probs
                 are in [0,1]), V per-(row,head) max-abs.
  core_int8qk  - only QK^T int8 (AV stays bf16) — isolates which half wins.

plus the max |delta| of each int8 variant vs the bf16 core (accuracy side).

Why it can lose: both dots have tiny contraction/lane dims (hd=64,
LP=100) so the int8 MXU rate advantage is hard to feed, while the
quantize adds four full VPU passes (amax reduce + scale) over Q, K, P, V
per layer that cannot fuse through the dot. Why it could win: the int8
dot runs at ~1.8x the bf16 MXU rate when well-fed
(benchmarks/probe_pallas_int8.py).

Run: python benchmarks/probe_int8_attncore.py   (one TPU process!)
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks.probe_attn_core import (  # noqa: E402
    B, HD, H, LP, ROWS, core_xla, two_point,
)
from lemon_tpu.models.clip import _block_diag_mask  # noqa: E402

PACK = 2
L = LP // PACK
SCALE = HD ** -0.5
MASK = _block_diag_mask(PACK, L, causal=False)


def _quant_rh(t):
    """per-(row, head) symmetric max-abs int8 quantize of (R, L, H, D)."""
    a = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(1, 3), keepdims=True)
    s = jnp.maximum(a, 1e-12) / 127.0
    return jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127).astype(jnp.int8), s


def core_int8(q, k, v, softmax_dtype, av_int8=True):
    def one(qq):
        qi, qs = _quant_rh(qq * SCALE)
        ki, ks = _quant_rh(k)
        acc = jnp.einsum("blhd,bmhd->bhlm", qi, ki, preferred_element_type=jnp.int32)
        # (R,1,H,1) scales -> (R,H,1,1) on the bhlm layout
        logits = acc.astype(jnp.float32) * (qs * ks).transpose(0, 2, 1, 3)
        logits = (logits + MASK.astype(jnp.float32)).astype(softmax_dtype)
        probs = jax.nn.softmax(logits, axis=-1)
        if not av_int8:
            return jnp.einsum(
                "bhlm,bmhd->blhd", probs.astype(v.dtype), v
            )
        pi = jnp.round(probs.astype(jnp.float32) * 127.0).astype(jnp.int8)  # probs in [0,1]
        vi, vs = _quant_rh(v)
        oacc = jnp.einsum("bhlm,bmhd->blhd", pi, vi, preferred_element_type=jnp.int32)
        return (oacc.astype(jnp.float32) * (vs / 127.0)).astype(v.dtype)

    out = q
    for _ in range(12):
        out = one(out)
    return out


def runner(fn, softmax_dtype, **kw):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(q, k, v, steps):
        def body(carry, step):
            out = fn(q + carry.astype(q.dtype) * 1e-6, k, v, softmax_dtype, **kw)
            return jnp.sum(out.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((ROWS, LP, H, HD)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((ROWS, LP, H, HD)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((ROWS, LP, H, HD)) * 0.1, jnp.bfloat16)

    results = {}
    for name, fn, kw in (
        ("core_bf16", core_xla, {}),
        ("core_int8", core_int8, {"av_int8": True}),
        ("core_int8qk", core_int8, {"av_int8": False}),
    ):
        per = two_point(runner(fn, jnp.bfloat16, **kw), q, k, v)
        results[name + "_ms"] = round(per * 1e3, 3)
        print(f"{name}: {per * 1e3:.3f} ms / 12 core passes", flush=True)

    ref = core_xla(q, k, v, jnp.bfloat16).astype(jnp.float32)
    for name, kw in (("core_int8", {"av_int8": True}), ("core_int8qk", {"av_int8": False})):
        got = core_int8(q, k, v, jnp.bfloat16, **kw).astype(jnp.float32)
        results[name + "_maxdiff"] = float(jnp.max(jnp.abs(ref - got)))
    # stack-context arithmetic: shipped int8 stack = 6.13 ms with a
    # 2.21 ms bf16 core (BENCH_NOTES round-4 decomposition); a core at
    # X ms would put the stack at 3.92 + X.
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
