"""int4 matmul feasibility probe (round 3).

The static-act int8 path lands the vision matmuls at ~330 TOPS measured
(probe_pallas_int8), which bounds the full ViT-B/32 pipeline at ~26k
img/s — still half the driver's 50k target. The only dtype lower than
int8 the MXU could plausibly run faster is int4; this probe asks XLA to
lower a serially-chained int4 ``dot_general`` at the ViT shapes and at
4096^3, with int8 and bf16 twins for scale.

Outcomes: (a) int4 ~2x int8 -> a W4A8/W4A4 embed mode becomes a real
candidate (accuracy study required); (b) int4 ~= int8 (upcast lowering)
or unsupported -> the int8-static pipeline is the dtype endpoint on this
chip and BENCH_NOTES documents the roofline as final.

Run: python benchmarks/probe_int4.py   (one TPU process at a time!)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks.probe_pallas_int8 import chain_rate  # noqa: E402

# the embed pipeline's packed token count (B=128 images, pack=2, L=100)
TOKENS = 6400


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    results = {}

    def requant(y32, lo, hi, dtype):
        return jnp.clip(y32 >> 8, lo, hi).astype(dtype)

    # each chain step keeps the carry shape: square at 4096^3, and the ViT
    # MLP as the fc->proj PAIR (768->3072->768) at the packed token count
    for tag, m, shapes in (
        ("4096", 4096, ((4096, 4096),)),
        ("vit_mlp_pair", TOKENS, ((768, 3072), (3072, 768))),
    ):
        fl = sum(2 * m * k * n for k, n in shapes)

        def make_step(ws, lo, hi, dtype):
            def step(x):
                for w in ws:
                    x = requant(jnp.dot(x, w, preferred_element_type=jnp.int32), lo, hi, dtype)
                return x
            return step

        ws8 = [jnp.asarray(rng.integers(-64, 64, s), jnp.int8) for s in shapes]
        x8 = jnp.asarray(rng.integers(-64, 64, (m, shapes[0][0])), jnp.int8)
        results[f"int8_{tag}"] = chain_rate(
            make_step(ws8, -127, 127, jnp.int8), x8, fl, f"XLA int8 {tag} (chained, requant)")
        try:
            ws4 = [jnp.asarray(rng.integers(-7, 8, s), jnp.int4) for s in shapes]
            x4 = jnp.asarray(rng.integers(-7, 8, (m, shapes[0][0])), jnp.int4)
            results[f"int4_{tag}"] = chain_rate(
                make_step(ws4, -7, 7, jnp.int4), x4, fl, f"XLA int4 {tag} (chained, requant)")
        except Exception as e:  # unsupported lowering is itself the answer
            print(f"int4 {tag}: FAILED — {type(e).__name__}: {str(e)[:200]}", flush=True)
            results[f"int4_{tag}"] = None
        try:
            # mixed W4A8: int8 activations x int4 weights, MXU-native if
            # XLA lowers the mixed dot without an in-graph upcast
            results[f"w4a8_{tag}"] = chain_rate(
                make_step(ws4, -127, 127, jnp.int8), x8, fl, f"XLA int4-weight/int8-act {tag}")
        except Exception as e:
            print(f"w4a8 {tag}: FAILED — {type(e).__name__}: {str(e)[:200]}", flush=True)
            results[f"w4a8_{tag}"] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
