"""int8_static batch-size sweep (round 5).

The shipped bench measures int8_static at B=128 — inherited from the
bf16 sweep (128 beat 256/512, BENCH_NOTES round 2) — but the only int8
batch sweep on record is the DYNAMIC mode (round 3: B=192 at 21,289
img/s edged B=128's 21,175, with a reproducible cliff at 256). The
static-act mode has different fusion structure (no per-token amax
reduce), and the round-4 pooled-block weight-only fix changed the head
cost profile, so the optimum may have moved. This probe measures
int8_static at B in {128, 160, 192} plus a bf16 B=128 control in ONE
process (same-session comparability; the drift study pins int8 variance
at ~±2% within a session).

Uses bench.bench_embeddings verbatim — the measured program IS the
bench leg's program, so a winner can ship as a one-line batch change.

Run: python benchmarks/probe_int8_batch.py   (one TPU process at a time!)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bench_embeddings  # noqa: E402


def main():
    import jax

    from lemon_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    # bf16 control first (stable across days) to anchor the session
    for tag, batch, mode in (
        ("bf16_b128", 128, "bf16"),
        ("int8s_b128", 128, "int8_static"),
        ("int8s_b160", 160, "int8_static"),
        ("int8s_b192", 192, "int8_static"),
    ):
        rate = bench_embeddings(batch_size=batch, mode=mode)
        results[tag] = round(rate, 1)
        print(f"{tag}: {rate:,.0f} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
