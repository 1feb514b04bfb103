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

MEASURED (round 3, v5e via relay): outcome (b). Every int4
``convert_element_type`` raises ``UNIMPLEMENTED: TPU backend error`` —
both host->device transfer (relay shim RecursionError) and an on-device
jitted cast from int8; W4A8 mixed dots are therefore unreachable too.
int8 reference legs, two sessions (int8 clock drift on this chip spans
14-23k img/s-equivalent across a day, BENCH_NOTES "int8 throughput
drift"): an early run read 311-324 TOPS at 4096^3 / 255 at the ViT MLP
pair; the recorded final run (same code, exclusive tunnel) read 351.9 /
316.2 — the BENCH_NOTES numbers. Both sit in probe_pallas_int8's 318-355
band once drift is accounted for; the int4 verdict is unaffected (it is
an UNIMPLEMENTED error, not a rate). int8-static is the dtype endpoint
on this chip; see BENCH_NOTES
"int4 feasibility" for the roofline writeup. NOTE: a backend
UNIMPLEMENTED error can wedge the relay client for subsequent transfers
in the same process, so all int8 legs run before any int4 attempt.

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

    def make_step(ws, lo, hi, dtype):
        def step(x):
            for w in ws:
                x = requant(jnp.dot(x, w, preferred_element_type=jnp.int32), lo, hi, dtype)
            return x
        return step

    # each chain step keeps the carry shape: square at 4096^3, and the ViT
    # MLP as the fc->proj PAIR (768->3072->768) at the packed token count
    cases = []
    for tag, m, shapes in (
        ("4096", 4096, ((4096, 4096),)),
        ("vit_mlp_pair", TOKENS, ((768, 3072), (3072, 768))),
    ):
        fl = sum(2 * m * k * n for k, n in shapes)
        ws8 = [jnp.asarray(rng.integers(-64, 64, s), jnp.int8) for s in shapes]
        x8 = jnp.asarray(rng.integers(-64, 64, (m, shapes[0][0])), jnp.int8)
        cases.append((tag, fl, ws8, x8))

    # int8 reference legs FIRST: a backend UNIMPLEMENTED from the int4
    # attempts can wedge the relay client for later transfers
    for tag, fl, ws8, x8 in cases:
        results[f"int8_{tag}"] = chain_rate(
            make_step(ws8, -127, 127, jnp.int8), x8, fl, f"XLA int8 {tag} (chained, requant)")

    for tag, fl, ws8, x8 in cases:
        # the relay cannot TRANSFER int4 host->device (RecursionError in the
        # transfer shim), so materialize int4 on-device by a jitted cast of
        # the int8 arrays — values already fit in [-7, 7] after clipping
        ws4 = None
        try:
            to4 = jax.jit(lambda t: jnp.clip(t, -7, 7).astype(jnp.int4))
            ws4 = [jax.block_until_ready(to4(w)) for w in ws8]
            x4 = jax.block_until_ready(to4(x8))
            results[f"int4_{tag}"] = chain_rate(
                make_step(ws4, -7, 7, jnp.int4), x4, fl, f"XLA int4 {tag} (chained, requant)")
        except Exception as e:  # unsupported lowering is itself the answer
            print(f"int4 {tag}: FAILED — {type(e).__name__}: {str(e)[:200]}", flush=True)
            results[f"int4_{tag}"] = None
        try:
            # mixed W4A8: int8 activations x int4 weights, MXU-native if
            # XLA lowers the mixed dot without an in-graph upcast
            if ws4 is None:
                raise RuntimeError("int4 weights unavailable (int4 leg failed)")
            results[f"w4a8_{tag}"] = chain_rate(
                make_step(ws4, -127, 127, jnp.int8), x8, fl, f"XLA int4-weight/int8-act {tag}")
        except Exception as e:
            print(f"w4a8 {tag}: FAILED — {type(e).__name__}: {str(e)[:200]}", flush=True)
            results[f"w4a8_{tag}"] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
