"""int8_static throughput drift: a discriminating experiment (round 5).

Round 3 recorded that the identical int8 program read 23.4k -> 14.2k
img/s across a day while interleaved bf16 runs held 16.87-16.96k, and
ruled out the act-stats sow, host-vs-device quantization layouts, and
text-tower quantization. The remaining hypothesis is chip-side power /
clock management under int8's higher MXU duty. This probe tests that
hypothesis directly within one process:

  1. A-B-A-B interleave: bf16, int8, bf16, int8 (both towers resident;
     any drift that appears here but not in bf16 is mode-specific).
  2. Sustained int8 load (~LOAD_S s of back-to-back full-pipeline scans)
     then an IMMEDIATE int8 + bf16 measurement ("hot").
  3. IDLE_S seconds of device silence, then the same pair ("cooled").

If hot < cooled for int8 while bf16 holds, the power/clock hypothesis is
confirmed and the drift is bounded by the hot/cooled spread. If the pair
is flat here but differs across runs of this script hours apart (see
drift_log.jsonl), the drift operates on a longer timescale than load
state and stays "chip-state, unexplained" with a measured bound.

Each run appends one JSON line to benchmarks/drift_log.jsonl so evidence
accumulates across a session. Run (one TPU process at a time!):

    python benchmarks/probe_int8_drift.py [--idle 120] [--load 40] [--quick]

--quick skips the load/idle phases (cross-session data point only).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks.probe_attn_core import B, scan_runner, two_point  # noqa: E402

from lemon_tpu.core.precision import Precision  # noqa: E402
from lemon_tpu.models.clip import (  # noqa: E402
    ClipConfig,
    ClipModel,
    calibrate_act_scales,
    init_params,
    quantize_clip_params_jit,
)
from lemon_tpu.ops.image import preprocess_device  # noqa: E402

LOG = Path(__file__).resolve().parent / "drift_log.jsonl"


def build(precision):
    cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=precision)
    if precision.matmul_int8:
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), np.uint8))
        pp = jax.jit(lambda im: preprocess_device(im, size=224, pil_rounding=False, precision="default"))
        pixels = jax.block_until_ready(pp(images))
        params = quantize_clip_params_jit(params, static_act=True)
        params = calibrate_act_scales(model, params, pixels=pixels)

    def full_apply(p, imgs, model=model):
        px = preprocess_device(imgs, size=224, pil_rounding=False, precision="default")
        emb = model.apply(p, px, method=ClipModel.encode_image)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    return scan_runner(full_apply), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--idle", type=float, default=120.0)
    ap.add_argument("--load", type=float, default=40.0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    t_start = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), np.uint8))

    run_bf16, p_bf16 = build(Precision.bf16())
    run_int8, p_int8 = build(Precision.int8_static())

    record = {"t_unix": round(t_start, 1), "quick": bool(args.quick), "batch": B}
    seq = []

    def measure(tag, run, params):
        per = two_point(run, params, images)
        ips = B / per
        seq.append({"tag": tag, "t": round(time.time() - t_start, 1), "img_s": round(ips)})
        print(f"[{time.time() - t_start:7.1f}s] {tag}: {per * 1e3:.2f} ms = {ips:.0f} img/s", flush=True)
        return ips

    # Phase 1: A-B-A-B interleave (first calls also compile).
    measure("bf16_a1", run_bf16, p_bf16)
    measure("int8_b1", run_int8, p_int8)
    measure("bf16_a2", run_bf16, p_bf16)
    measure("int8_b2", run_int8, p_int8)

    if not args.quick:
        # Phase 2: sustained int8 load, then immediate "hot" pair.
        print(f"[{time.time() - t_start:7.1f}s] sustained int8 load {args.load:.0f}s", flush=True)
        t0 = time.time()
        n_load = 0
        while time.time() - t0 < args.load:
            float(run_int8(p_int8, images, 22))
            n_load += 22
        record["load_batches"] = n_load
        measure("int8_hot", run_int8, p_int8)
        measure("bf16_hot", run_bf16, p_bf16)

        # Phase 3: idle, then "cooled" pair.
        print(f"[{time.time() - t_start:7.1f}s] idle {args.idle:.0f}s", flush=True)
        time.sleep(args.idle)
        measure("int8_cool", run_int8, p_int8)
        measure("bf16_cool", run_bf16, p_bf16)

    record["seq"] = seq
    with LOG.open("a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
